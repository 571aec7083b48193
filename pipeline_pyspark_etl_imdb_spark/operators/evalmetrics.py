"""Distributed model-evaluation metrics — the measurement half of the
learned-filter loop (train a quality classifier, THEN check it ranks
real positives above negatives before gating a 100 TB corpus on it).

AUC via the rank-sum (Mann-Whitney) identity:

    AUC = (sum of positive ranks - n_pos(n_pos+1)/2) / (n_pos * n_neg)

which needs exactly one global rank — computed here with the
DISTRIBUTED rank machinery (ranks.total_order_ranks: range shuffle +
broadcast partition offsets, no single-partition window), then one
constant-size aggregate. No per-threshold sweep, no collect of scores.

Determinism: the rank order (score, id) is tie-free, so ranks — and
therefore the AUC — are engine-exact and hash-match the oracle's
window-function formulation. (True tie handling would average tied
ranks; with a deterministic id tie-break both engines bias identically,
which is what an oracle-checked pipeline wants. The bias is zero when
scores are continuous.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks


def rank_sum_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
) -> DataFrame:
    """One-row (n_pos, n_neg, auc) for a double score column against a
    boolean/0-1 label column. Cost: one range shuffle (the distributed
    rank) + one constant-size aggregate."""
    ranked = total_order_ranks(
        df.select(id_col, score_col, F.col(label_col).cast("int").alias("__y")),
        [score_col, id_col],
    )
    agg = ranked.agg(
        F.sum("__y").cast("bigint").alias("n_pos"),
        F.sum(F.lit(1) - F.col("__y")).cast("bigint").alias("n_neg"),
        F.sum(F.col("__y") * F.col("global_rn")).cast("bigint").alias("__rank_sum"),
    )
    auc = (
        F.col("__rank_sum").cast("double")
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1).cast("double") / 2.0
    ) / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    return agg.select("n_pos", "n_neg", auc.alias("auc"))


def threshold_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
) -> DataFrame:
    """(threshold, tp, fp, fn, tn, precision, recall, f1) for each cut —
    the operating-point table a filter rollout picks from. ONE pass over
    the data: per-threshold counts are conditional sums inside a single
    partial aggregate (|thresholds| x 4 counters map-side), never one job
    per threshold."""
    y = F.col(label_col).cast("int")
    s = F.col(score_col)
    aggs = []
    for i, t in enumerate(thresholds):
        pred = (s >= F.lit(float(t))).cast("int")
        aggs += [
            F.sum(pred * y).cast("bigint").alias(f"__tp{i}"),
            F.sum(pred * (1 - y)).cast("bigint").alias(f"__fp{i}"),
            F.sum((1 - pred) * y).cast("bigint").alias(f"__fn{i}"),
            F.sum((1 - pred) * (1 - y)).cast("bigint").alias(f"__tn{i}"),
        ]
    one = df.agg(*aggs)
    rows = []
    for i, t in enumerate(thresholds):
        tp, fp = F.col(f"__tp{i}"), F.col(f"__fp{i}")
        fn, tn = F.col(f"__fn{i}"), F.col(f"__tn{i}")
        prec = F.when(tp + fp > 0, tp.cast("double") / (tp + fp)).otherwise(0.0)
        rec = F.when(tp + fn > 0, tp.cast("double") / (tp + fn)).otherwise(0.0)
        f1 = F.when(
            prec + rec > 0, 2.0 * prec * rec / (prec + rec)
        ).otherwise(0.0)
        rows.append(
            F.struct(
                F.lit(float(t)).alias("threshold"),
                tp.alias("tp"),
                fp.alias("fp"),
                fn.alias("fn"),
                tn.alias("tn"),
                prec.alias("precision"),
                rec.alias("recall"),
                f1.alias("f1"),
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("m"))
        .select("m.*")
        .orderBy("threshold")
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table: per equal-width score bin, the count,
    mean score, and empirical positive rate — the calibration check that
    decides whether a filter's scores can be thresholded on probability
    semantics at all. Scores at exactly 1.0 fold into the top bin.
    ONE partial-aggregated groupBy on the bin index."""
    y = F.col(label_col).cast("int")
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.avg(score_col).alias("avg_score"),
            F.avg(y.cast("double")).alias("frac_positive"),
        )
        .orderBy("bin")
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One-row Murphy decomposition of the Brier score of a [0,1]
    forecast against a 0/1 label, over the same equal-width bins as
    calibration_bins (top-edge fold into the last bin):

        reliability = (1/N) sum_k n_k (fbar_k - obar_k)^2   (miscalibration)
        resolution  = (1/N) sum_k n_k (obar_k - obar)^2     (discrimination)
        uncertainty = obar (1 - obar)

    plus the EXACT Brier score (1/N) sum_i (f_i - o_i)^2 and the
    within-bin residual brier - (rel - res + unc), which is zero only
    when forecasts are constant within bins — reporting it keeps the
    identity honest instead of silently assuming binned forecasts.

    Shape: ONE partial-aggregated groupBy(bin) carrying (n, sum f,
    sum f^2, sum o, sum f*o), then a constant-size fold over <= n_bins
    rows (the psi_drift pattern) — the data is read once."""
    f = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int").cast("double")
    b = F.least(F.floor(f * n_bins).cast("int"), F.lit(n_bins - 1))
    bins = df.groupBy(b.alias("bin")).agg(
        F.count("*").cast("double").alias("nk"),
        F.sum(f).alias("sf"),
        F.sum(f * f).alias("sff"),
        F.sum(y).alias("so"),
        F.sum(f * y).alias("sfo"),
    )
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = (
        bins.withColumn("n", F.sum("nk").over(w))
        .withColumn("o_all", F.sum("so").over(w) / F.col("n"))
    )
    fbar = F.col("sf") / F.col("nk")
    obar = F.col("so") / F.col("nk")
    rel_k = F.col("nk") * (fbar - obar) * (fbar - obar)
    res_k = F.col("nk") * (obar - F.col("o_all")) * (obar - F.col("o_all"))
    # per-bin exact Brier mass: sum (f - o)^2 = sff - 2 sfo + so  (o^2 = o)
    brier_k = F.col("sff") - F.lit(2.0) * F.col("sfo") + F.col("so")
    out = tot.agg(
        F.first("n").cast("bigint").alias("n"),
        F.first("o_all").alias("base_rate"),
        (F.sum(brier_k) / F.first("n")).alias("brier"),
        (F.sum(rel_k) / F.first("n")).alias("reliability"),
        (F.sum(res_k) / F.first("n")).alias("resolution"),
        (F.first("o_all") * (F.lit(1.0) - F.first("o_all"))).alias(
            "uncertainty"
        ),
    )
    return out.select(
        "n",
        "base_rate",
        "brier",
        "reliability",
        "resolution",
        "uncertainty",
        (
            F.col("brier")
            - (
                F.col("reliability")
                - F.col("resolution")
                + F.col("uncertainty")
            )
        ).alias("within_bin_residual"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    split_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    eps: float = 1e-6,
) -> DataFrame:
    """One-row Population Stability Index between the two halves of a
    boolean split (expected = split false, actual = split true):

        PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

    over equal-width bins of ``value_col`` on [lo, hi] — the standard
    score-drift alarm (<0.1 stable, 0.1-0.25 moderate, >0.25 shifted).
    Empty bins are smoothed with ``eps`` so the log stays finite, the
    conventional treatment. Output: (n_expected, n_actual, psi).

    Shape: ONE partial-aggregated groupBy(bin) carrying two conditional
    counts, then a constant-size re-aggregate — the data is read once."""
    frac = (F.col(value_col) - lo) / (hi - lo)
    b = F.greatest(
        F.lit(0),
        F.least(F.floor(frac * n_bins).cast("int"), F.lit(n_bins - 1)),
    )
    s = F.col(split_col).cast("int")
    bins = df.groupBy(b.alias("bin")).agg(
        F.sum(1 - s).cast("bigint").alias("__ne"),
        F.sum(s).cast("bigint").alias("__na"),
    )
    # totals via an unpartitioned window over the BINS frame (<= n_bins
    # rows — the ranks.py offsets pattern), NOT a second aggregation of
    # `bins`: referencing `bins` from two subtrees would re-scan the raw
    # source, and at 100 TB "read the data once" is the whole point
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    shares = bins.withColumn(
        "n_expected", F.sum("__ne").over(w).cast("bigint")
    ).withColumn("n_actual", F.sum("__na").over(w).cast("bigint"))
    p = F.col("__ne").cast("double") / F.col("n_expected") + eps
    q = F.col("__na").cast("double") / F.col("n_actual") + eps
    contrib = (p - q) * F.log(p / q)
    return (
        shares.agg(
            F.first("n_expected").alias("n_expected"),
            F.first("n_actual").alias("n_actual"),
            F.sum(contrib).alias("psi"),
        )
    )


def conformal_cutoff(
    scored: DataFrame,
    score_col: str,
    alphas: tuple[float, ...] = (0.05, 0.10, 0.20),
    calib_frac_mod: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Split-conformal quality gating (Vovk et al.; Angelopoulos & Bates
    2023 tutorial): from a deterministic md5 calibration split, the
    EXACT finite-sample-corrected cutoff per miscoverage level alpha —
    the k-th smallest calibration score with k = ceil((n+1)*(1-alpha)),
    clamped to n. Keeping only rows scoring BELOW the cutoff guarantees
    (under exchangeability) that at most ~alpha of kept rows would have
    been rejected by the true distribution — the principled version of
    "pick a quality threshold by eyeball".

    Exactness: the cutoff is an ORDER STATISTIC (no interpolation), the
    split is md5-determined, and k is integer arithmetic on the same
    IEEE double product both engines compute — fully oracle-backed.

    Shape: the calibration subset is hash-filtered at the scan, ONE
    exact-rank pick per alpha via orderBy+limit(k) -> tail (compiles to
    TakeOrderedAndProject; k rows cross to the driver only in the
    k << n regime a calibration split lives in — for huge k use the
    distributed-ranks path instead), and the reported coverage is one
    conditional aggregate over the full frame."""
    import math as _math

    id_expr = (
        F.col(id_col).cast("string")
        if id_col is not None
        else F.col(score_col).cast("string")
    )
    split_u32 = F.conv(
        F.substring(F.md5(F.concat(id_expr, F.lit(":conformal"))), 1, 8), 16, 10
    ).cast("bigint")
    base = scored.select(
        F.col(score_col).alias("score"), (split_u32 % calib_frac_mod == 0).alias("__cal")
    )
    base = base.persist()
    try:
        n = base.where(F.col("__cal")).count()
        rows = []
        for alpha in alphas:
            k = min(n, int(_math.ceil((n + 1) * (1.0 - alpha))))
            kth = (
                base.where(F.col("__cal"))
                .orderBy(F.asc("score"))
                .limit(k)
                .orderBy(F.desc("score"))
                .limit(1)
                .collect()
            )
            if not kth:
                # empty calibration split: no order statistic exists, so
                # no gate row is emitted for this alpha (mirrors the
                # oracle, whose cutoff join over zero ranked rows yields
                # nothing). Reachable only when the split is empty —
                # n >= 1 implies k >= 1 implies a kth row.
                continue
            cutoff = float(kth[0].score)
            kept = base.agg(
                F.sum(
                    F.when(~F.col("__cal") & (F.col("score") <= cutoff), 1).otherwise(0)
                ).alias("kept"),
                F.sum(F.when(~F.col("__cal"), 1).otherwise(0)).alias("test_n"),
            ).collect()[0]
            rows.append(
                (
                    float(alpha),
                    n,
                    k,
                    cutoff,
                    int(kept.kept or 0),
                    int(kept.test_n or 0),
                    (kept.kept / kept.test_n) if kept.test_n else None,
                )
            )
        return scored.sparkSession.createDataFrame(
            rows,
            "alpha double, n_calib bigint, k bigint, cutoff double,"
            " kept_test bigint, n_test bigint, test_keep_rate double",
        ).orderBy("alpha")
    finally:
        base.unpersist()


def isotonic_calibration(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 50,
) -> DataFrame:
    """Isotonic (PAV) score calibration: (bin, n, frac_pos, calibrated)
    where ``calibrated`` is the pool-adjacent-violators fit over the
    binned score/label table — the nonparametric upgrade of
    calibration_bins when the raw reliability curve is non-monotone
    (Zadrozny & Elkan 2002).

    Split of labor: binning + per-bin positives is ONE partial-
    aggregated groupBy over the corpus (the only distributed pass); PAV
    runs on the driver over the <= n_bins aggregate rows — bounded
    model state, the k-means-centroid class. Deterministic: pooled
    values are ratios of integer sums and the pooling order is the
    fixed left-to-right PAV scan; pinned against a pure-Python PAV in
    tests (rows-only for the driver — the pooling loop is not one SQL
    query)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    bins = (
        scored.select(
            b.alias("bin"),
            F.when(F.col(label_col).cast("boolean"), 1).otherwise(0).alias("y"),
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
        .orderBy("bin")
        .collect()
    )
    # PAV: maintain a stack of (weight, pos_sum, members); merge while
    # the tail violates monotonicity (mean decreasing)
    stack: list[list] = []
    for r in bins:
        stack.append([int(r.n), int(r.pos), [(int(r.bin), int(r.n), int(r.pos))]])
        while len(stack) >= 2 and (
            stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]
        ):  # mean(prev) > mean(last), integer cross-multiply (exact)
            w2, p2, m2 = stack.pop()
            w1, p1, m1 = stack.pop()
            stack.append([w1 + w2, p1 + p2, m1 + m2])
    rows = []
    for w, p, members in stack:
        fitted = p / w
        for bin_id, n, pos in members:
            rows.append((bin_id, n, pos / n if n else 0.0, fitted))
    return scored.sparkSession.createDataFrame(
        rows, "bin int, n bigint, frac_pos double, calibrated double"
    ).orderBy("bin")


def ranking_eval(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Ranking-quality evaluation of cosine retrieval: per query vector,
    nDCG@k and MRR@k with label agreement as the relevance signal — the
    standard report for a retrieval/embedding rollout (ann_recall_report
    measures an INDEX against brute force; this measures the brute-force
    ranking itself against ground truth, the complementary axis).

    Definitions: binary relevance rel_r = [query label == neighbor
    label]; DCG = sum rel_r / log2(r+1); IDCG over min(k, corpus
    relevant) ideal ranks (NULL nDCG when a query's label has no other
    members — no ideal ranking exists); MRR = max(rel_r / r), i.e. the
    reciprocal of the first relevant rank, 0 when none retrieved.

    Shape: the ranked list comes from cosine_knn (bounded query set
    broadcast, corpus never shuffles, WindowGroupLimit cut); labels join
    back via one broadcast (query side) and one equi-join (neighbor
    side); per-query metrics are one partial-aggregated groupBy; the
    per-label corpus counts frame is label-cardinality-sized and
    broadcasts. log2 enters only at the final scoring expression (6-dp
    comparison absorbs libm ulps, same policy as the DSIR/Zipf ln use)."""
    from pipeline_pyspark_etl_imdb_spark.operators.similarity import cosine_knn

    ranked = cosine_knn(
        embeddings, k=k, query_ids=list(query_ids), id_col=id_col, vec_col=vec_col
    )
    labels = embeddings.select(F.col(id_col), F.col(label_col).alias("__lab"))
    q_labels = F.broadcast(
        labels.where(F.col(id_col).isin(list(query_ids))).select(
            F.col(id_col).alias("query_id"), F.col("__lab").alias("q_lab")
        )
    )
    n_labels = labels.select(
        F.col(id_col).alias("neighbor_id"), F.col("__lab").alias("n_lab")
    )
    rel = (F.col("q_lab") == F.col("n_lab")).cast("int")
    per_query = (
        ranked.join(q_labels, "query_id")
        .join(n_labels, "neighbor_id")
        .groupBy("query_id", "q_lab")
        .agg(
            F.sum(rel / F.log2(F.col("rk") + 1)).alias("dcg"),
            F.max(rel.cast("double") / F.col("rk")).alias("mrr"),
            F.sum(rel).cast("bigint").alias("n_retrieved_rel"),
        )
    )
    label_counts = F.broadcast(
        labels.groupBy(F.col("__lab").alias("q_lab")).agg(
            (F.count("*") - 1).alias("n_rel_corpus")
        )
    )
    ideal_n = F.least(F.lit(k), F.col("n_rel_corpus"))
    idcg = F.when(
        F.col("n_rel_corpus") > 0,
        F.aggregate(
            F.sequence(F.lit(1), ideal_n),
            F.lit(0.0),
            lambda acc, r: acc + F.lit(1.0) / F.log2(r + 1),
        ),
    )
    return (
        per_query.join(label_counts, "q_lab")
        .select(
            "query_id",
            F.col("n_rel_corpus").cast("bigint").alias("n_rel_corpus"),
            "n_retrieved_rel",
            "dcg",
            (F.col("dcg") / idcg).alias("ndcg"),
            "mrr",
        )
        .orderBy("query_id")
    )


def contingency_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """One-row independence report for two categorical columns:
    (n, n_a, n_b, chi2, cramers_v, mutual_info) — the feature-selection /
    leakage screen ("is lang informative about source?") run before a
    column is trusted as a stratification key or dropped as redundant.

        chi2 = sum_ij (O_ij - E_ij)^2 / E_ij,  E_ij = r_i * c_j / n
        V    = sqrt(chi2 / (n * (min(R,C) - 1)))
        MI   = sum_ij p_ij * ln(p_ij * n^2 / (r_i * c_j))   [nats]

    Shape: ONE partial-aggregated groupBy(a, b) builds the contingency
    cells (RxC rows — category-domain-sized, never data-sized); marginals
    come from two windows OVER THE CELLS frame partitioned by each axis
    (the psi_drift pattern: no second scan of the source); the final
    fold is a constant-size aggregate. Exactness: every count is BIGINT;
    the per-cell doubles are division/multiplication chains evaluated
    identically cross-engine, and ln parity follows the PSI precedent.
    Rows with a NULL in either column are excluded — a NULL level has no
    stable cross-engine ordering or distinct-count contract."""
    from pyspark.sql import Window

    cells = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).cast("string").alias("a"),
            F.col(col_b).cast("string").alias("b"),
        )
        .agg(F.count("*").alias("o"))
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_a = Window.partitionBy("a").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_b = Window.partitionBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    marg = (
        cells.withColumn("n", F.sum("o").over(w_all))
        .withColumn("r", F.sum("o").over(w_a))
        .withColumn("c", F.sum("o").over(w_b))
        .withColumn("n_a", F.size(F.collect_set("a").over(w_all)))
        .withColumn("n_b", F.size(F.collect_set("b").over(w_all)))
    )
    o = F.col("o").cast("double")
    n = F.col("n").cast("double")
    e = F.col("r").cast("double") * F.col("c").cast("double") / n
    chi2_cell = (o - e) * (o - e) / e
    mi_cell = (o / n) * F.log(
        o * n / (F.col("r").cast("double") * F.col("c").cast("double"))
    )
    agg = marg.agg(
        F.first("n").cast("bigint").alias("n"),
        F.first("n_a").cast("bigint").alias("n_a"),
        F.first("n_b").cast("bigint").alias("n_b"),
        F.sum(chi2_cell).alias("chi2"),
        F.sum(mi_cell).alias("mutual_info"),
    )
    dof = F.least(F.col("n_a"), F.col("n_b")) - F.lit(1)
    v = F.when(
        dof > 0,
        F.sqrt(F.col("chi2") / (F.col("n").cast("double") * dof.cast("double"))),
    )
    return agg.select(
        "n", "n_a", "n_b", "chi2", v.alias("cramers_v"), "mutual_info"
    )


def ks_two_sample_report(
    df,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    cents: bool = True,
):
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    ``group_a`` and ``group_b`` populations of ``value_col`` — the
    nonparametric companion to the binned PSI drift monitor
    (quality_psi_drift): PSI needs a bin design; KS is the sup-distance
    between the two empirical CDFs and needs none.

    Exactness contract: values quantize to integer cents (the median/IQR
    family's contract), per-value counts are BIGINT, the CDFs are each
    ONE correctly-rounded division (cum/total), and the sup is a max
    over exact per-value differences — deterministic cross-engine, so
    the statistic itself hash-matches the oracle's window-CDF
    definition. The reported location is the SMALLEST value attaining
    the sup (deterministic tie-break).

    Scale shape: one distinct-value groupBy (domain-sized, partial-agg),
    the DISTRIBUTED prefix sum (ranks.total_order_prefix_sums — range
    shuffle + partition-count-bounded offsets, no single-partition
    window), and a TakeOrdered(1) argmax. The corpus never sorts
    globally and nothing data-sized reaches one task.

    Output: one row (n_a, n_b, ks_stat, at_value)."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import (
        total_order_prefix_sums,
    )

    spark = df.sparkSession
    scale = 100 if cents else 1
    vals = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.round(F.col(value_col) * scale, 0).cast("bigint").alias("c"),
    ).where(
        F.col("c").isNotNull() & F.col("g").isin([group_a, group_b])
    )
    per_value = vals.groupBy("c").agg(
        F.sum((F.col("g") == group_a).cast("bigint")).alias("na"),
        F.sum((F.col("g") == group_b).cast("bigint")).alias("nb"),
    )
    cum = total_order_prefix_sums(per_value, ["c"], ["na", "nb"])
    totals = vals.groupBy().agg(
        F.sum((F.col("g") == group_a).cast("bigint")).alias("ta"),
        F.sum((F.col("g") == group_b).cast("bigint")).alias("tb"),
    )
    scored = cum.crossJoin(F.broadcast(totals)).select(
        "c",
        "ta",
        "tb",
        F.abs(
            F.col("cum_na").cast("double") / F.col("ta")
            - F.col("cum_nb").cast("double") / F.col("tb")
        ).alias("d"),
    )
    top = scored.orderBy(F.desc("d"), F.asc("c")).limit(1)
    return top.select(
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        F.col("d").alias("ks_stat"),
        (F.col("c").cast("double") / scale).alias("at_value"),
    )


# Poisson(1) CDF ladder for the deterministic bootstrap: cumulative
# probabilities as exact double literals SHARED VERBATIM with the oracle
# SQL (a uniform u maps to the smallest level with u < cdf). Truncated at
# 6 (P(X > 6) ~ 8e-5; the truncation is part of the operator definition,
# identical in both engines).
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def bootstrap_mean_ci(
    df,
    value_col: str,
    id_col: str,
    n_replicates: int = 128,
    alpha: float = 0.05,
    cents: bool = True,
    salt: str = "boot",
):
    """Percentile-bootstrap confidence interval for the mean of
    ``value_col`` — fully deterministic (Poisson bootstrap on md5-hex
    uniforms keyed by (id, replicate, salt); no RNG state), so the CI
    itself hash-matches the oracle: a statistical-rigor primitive with
    an exact correctness contract, like the KMV sketch.

    Poisson bootstrap (Chamandy et al. 2012): replicate b resamples each
    row Poisson(1) times — independent per (row, replicate), which is
    what makes the bootstrap embarrassingly parallel: no replicate ever
    needs a global n to draw a multinomial. Each replicate's weighted
    sum stays DECIMAL-exact in integer cents; the replicate mean is one
    correctly-rounded division chain; the percentile CI takes type-1
    order statistics of the B means (a B-row frame, driver-bounded).

    Scale shape: ONE scan fans out to n*B rows inside the stage (the
    explode fuses into the scan — nothing n*B-sized shuffles) and
    partially aggregates to B rows. B caps every later frame. Output:
    (n_rows, n_replicates, mean, ci_lo, ci_hi)."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform

    spark = df.sparkSession
    scale = 100 if cents else 1
    vals = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.round(F.col(value_col) * scale, 0).cast("bigint").alias("c"),
    ).where(F.col("c").isNotNull())
    base = vals.agg(
        F.count("*").alias("n"), F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
    ).collect()[0]
    n = int(base["n"])
    if n == 0:
        return spark.createDataFrame(
            [],
            "n_rows bigint, n_replicates int, mean double, ci_lo double, "
            "ci_hi double",
        )
    mean = (float(str(base["s"])) / n) / scale
    # the replicate explode multiplies per-row work by B (md5 + hex parse
    # per (row, replicate)); a single-file scan would run all n*B of them
    # on ONE core — fan out first (no-op when the scan already has splits)
    from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out

    vals = fan_out(vals)
    # one md5 per (row, BLOCK of 4 replicates): a 32-hex digest carries
    # four independent 8-hex uniforms, so the hash count is B/4 per row —
    # the dominant per-resample cost at any scale (measured 12 s -> 5 s
    # for B=128 at sf0.1). Replicate b = 4*block + j reads digest chars
    # [8j, 8j+8); a non-multiple-of-4 B falls back to per-replicate
    # hashing to keep the contract salt-for-salt deterministic.
    if n_replicates % 4 == 0:
        blocks = n_replicates // 4
        reps = (
            vals.select(
                "id",
                "c",
                F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("blk"),
            )
            .withColumn(
                "__h",
                F.md5(
                    F.concat(
                        F.col("id"),
                        F.lit(":"),
                        F.col("blk").cast("string"),
                        F.lit(":" + salt),
                    )
                ),
            )
            .select(
                "c",
                "blk",
                F.posexplode(
                    F.array(
                        *[
                            hex_uniform("__h", 8, start=8 * j).cast("double")
                            / F.lit(float(16**8))
                            for j in range(4)
                        ]
                    )
                ).alias("j", "__u"),
            )
            .select(
                "c",
                (F.col("blk") * 4 + F.col("j")).alias("rep"),
                F.col("__u"),
            )
        )
        u = F.col("__u")
    else:
        reps = vals.select(
            "id",
            "c",
            F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("rep"),
        ).withColumn(
            "__h",
            F.md5(F.concat(F.col("id"), F.lit(":"), F.col("rep").cast("string"),
                           F.lit(":" + salt))),
        )
        u = (hex_uniform("__h", 8).cast("double")) / F.lit(float(16**8))
    cnt = F.lit(6)
    for lvl in range(len(POISSON1_CDF) - 1, -1, -1):
        cnt = F.when(u < F.lit(POISSON1_CDF[lvl]), F.lit(lvl)).otherwise(cnt)
    means = (
        reps.withColumn("__cnt", cnt)
        .groupBy("rep")
        .agg(
            F.sum(
                F.col("__cnt").cast("decimal(38,0)")
                * F.col("c").cast("decimal(38,0)")
            ).alias("s"),
            F.sum(F.col("__cnt").cast("bigint")).alias("nb"),
        )
        .where(F.col("nb") > 0)
        .select(
            (
                F.col("s").cast("string").cast("double")
                / F.col("nb")
                / F.lit(float(scale))
            ).alias("m")
        )
    )
    # B-row frame: type-1 percentile order statistics via one sorted
    # collect inside an aggregate (bounded by n_replicates by design)
    arr = means.agg(F.sort_array(F.collect_list("m")).alias("a"))
    import math

    k_lo = max(1, math.ceil(alpha / 2 * n_replicates))
    k_hi = min(n_replicates, math.ceil((1 - alpha / 2) * n_replicates))
    return arr.select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.lit(n_replicates).alias("n_replicates"),
        F.lit(mean).alias("mean"),
        F.element_at("a", k_lo).alias("ci_lo"),
        F.element_at("a", min(k_hi, n_replicates)).alias("ci_hi"),
    )


def decile_lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Gains/lift table: rank by score DESCENDING into ``n_tiles``
    equal-population tiles, and report per tile the positive rate, lift
    over the base rate, and the cumulative share of all positives
    captured — the "top 10% of the filter's scores catches 43% of the
    English docs" readout that decides where a selection threshold pays.

    Shape: the DISTRIBUTED total-order rank (no single-partition window
    over the data) buckets the scored frame; one n_tiles-row groupBy,
    then cumulative sums over the TILE frame (bounded by n_tiles)."""
    from pyspark.sql import Window

    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    y = F.col(label_col).cast("int")
    scored = df.select(
        (-F.col(score_col)).alias("__neg"), F.col(id_col).alias("__id"), y.alias("__y")
    )
    ranked = total_order_ranks(scored, ["__neg", "__id"], ntile=n_tiles)
    tiles = ranked.groupBy(F.col("bucket").alias("tile")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcum = Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    t = (
        tiles.withColumn("__tot", F.sum("n").over(wall))
        .withColumn("__tot_pos", F.sum("n_pos").over(wall))
        .withColumn("__cum_pos", F.sum("n_pos").over(wcum))
    )
    pos_rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    base = F.col("__tot_pos").cast("double") / F.col("__tot").cast("double")
    return t.select(
        "tile",
        "n",
        "n_pos",
        pos_rate.alias("pos_rate"),
        (pos_rate / base).alias("lift"),
        (
            F.col("__cum_pos").cast("double") / F.col("__tot_pos").cast("double")
        ).alias("cum_capture"),
    ).orderBy("tile")
