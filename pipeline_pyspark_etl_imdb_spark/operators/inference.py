"""Nonparametric and multiple-testing inference operators.

The experimentation stack (operators/abtest.py) covers parametric
z-machinery; this module adds the distribution-free complements a data
team reaches for when normality is doubtful, plus the multiple-testing
control that keeps a per-group test battery honest:

- Mann-Whitney U rank-sum test (tie-corrected normal approximation);
- Wald-Wolfowitz runs test for sequence randomness;
- one-way ANOVA (F statistic + effect size);
- a hash-deterministic randomization (permutation) test;
- Benjamini-Hochberg FDR control over a per-group Welch z battery;
- bivariate Mahalanobis outlier flagging (closed-form 2x2 inverse).

Numeric policy (the oracle-portability contract shared by the whole
engine — see plans/oracles.py): every sum that feeds a comparison or a
hash-checked value is accumulated EXACTLY (BIGINT counts, DECIMAL sums
of 2/4-dp values), and doubles appear only in a final, fixed expression
tree over those exact sums — each division/multiplication is correctly
rounded IEEE-754, so both engines produce bit-identical doubles. The
only non-correctly-rounded primitive used is exp() inside the normal
CDF polynomial (A&S 7.1.26), whose at-most-1-ulp libm spread is
absorbed by the protocol's 6-decimal rounding.

Scale posture: every report here is one shuffle on the grouping key with
map-side partial aggregation (sums/counts), followed by arithmetic over
a group-count-sized frame. The Mann-Whitney rank walk runs over the
DISTINCT-VALUE frame (domain-bounded, e.g. cent prices), never the row
frame; the permutation test's replicate fan-out partial-aggregates to
(n_replicates x 2) rows before its only shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# chi^2_2 0.999 quantile: the bivariate outlier cut
CHI2_2DF_999 = 13.815510557964274

# Abramowitz & Stegun 7.1.26 erfc coefficients (the engine-portable
# normal tail: max abs error 1.5e-7, identical expression tree in the
# SQL oracle so both engines agree to libm-exp's ulp)
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def normal_sf_two_sided(z_abs: Column) -> Column:
    """Two-sided normal p-value 2*(1 - Phi(|z|)) = erfc(|z|/sqrt(2))
    via the A&S 7.1.26 polynomial. |z| must be non-negative."""
    x = z_abs / F.lit(2.0) ** F.lit(0.5)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    poly = F.lit(_AS_A[4])
    for a in reversed(_AS_A[:4]):
        poly = F.lit(a) + t * poly
    return t * poly * F.exp(-x * x)


def _d(c: Column) -> Column:
    return c.cast("double")


def mannwhitney_u_report(
    df: DataFrame,
    value_dec: Column,
    group: Column,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann-Whitney U between two named groups, tie-corrected normal z.

    ``value_dec`` must be an EXACT (decimal/integer) expression so ranks
    group exactly. The midrank sums stay integer-exact throughout: with
    the distinct-value frame carrying (cnt, cnt_a, cum_before),

        2*R_A = sum_v cnt_a_v * (2*cum_before_v + cnt_v + 1)

    as is the tie term T = sum(cnt^3 - cnt) and
    2*U_A = 2*R_A - n_a*(n_a+1). These accumulate in DECIMAL(38,0) (not
    BIGINT: at 10^13 rows 2*R_A ~ N^2 ~ 10^26 and a 2M-row tie group's
    cube overflow int64; DuckDB's HUGEINT sums are exact the same way).
    The z denominator applies the standard tie correction
    sigma^2 = (n_a*n_b/12) * ((N+1) - T/(N*(N-1))).

    One shuffle (value groupBy with partial agg); the midrank cumsum is a
    single window over the DISTINCT-value frame — bounded by the value
    DOMAIN (e.g. cent prices), not the row count, so the single-task
    window holds at any data scale.
    """
    two = df.where(group.isin(group_a, group_b)).select(
        value_dec.alias("v"), (group == group_a).cast("int").alias("is_a")
    )
    per_v = two.groupBy("v").agg(
        F.count("*").alias("cnt"), F.sum("is_a").alias("cnt_a")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "v",
        "cnt",
        "cnt_a",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    )
    cnt_dec = F.col("cnt").cast("decimal(12,0)")
    agg = ranked.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        (F.sum("cnt") - F.sum("cnt_a")).cast("bigint").alias("n_b"),
        F.sum(
            F.col("cnt_a").cast("decimal(18,0)")
            * (F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1)).cast(
                "decimal(19,0)"
            )
        ).alias("two_r_a"),
        F.sum(cnt_dec * cnt_dec * cnt_dec - cnt_dec).alias("tie_term"),
    )
    two_u = F.col("two_r_a") - F.col("n_a").cast("decimal(19,0)") * (
        F.col("n_a") + F.lit(1)
    ).cast("decimal(19,0)")
    n_tot = F.col("n_a") + F.col("n_b")
    sigma2 = (
        _d(F.col("n_a")) * _d(F.col("n_b")) / F.lit(12.0)
    ) * (
        (_d(n_tot) + F.lit(1.0))
        - _d(F.col("tie_term")) / (_d(n_tot) * (_d(n_tot) - F.lit(1.0)))
    )
    return agg.select(
        "n_a",
        "n_b",
        (_d(two_u) / F.lit(2.0)).alias("u_stat"),
        _d(F.col("tie_term")).alias("tie_term"),
        (
            (_d(two_u) - _d(F.col("n_a")) * _d(F.col("n_b")))
            / (F.lit(2.0) * F.sqrt(sigma2))
        ).alias("z"),
    )


def runs_test_report(
    df: DataFrame,
    key: str,
    value_dec: Column,
    order_cols: list[str],
    broadcast_totals: bool = True,
) -> DataFrame:
    """Wald-Wolfowitz runs test per ``key``: is the above/below-mean
    sequence (in ``order_cols`` order) random?

    The above/below classification is EXACT: with S = sum(value_dec) and
    N = count per key (decimal/integer), row v is 'above' iff
    v * N > S — a decimal comparison, no float mean ever materializes.
    Rows exactly equal to the mean are dropped (the standard dichotomy).
    Runs/counts are integers; only the closing z expression is double:

        E[R] = 1 + 2*n1*n2/N,  Var[R] = 2*n1*n2*(2*n1*n2 - N) / (N^2*(N-1))

    Two shuffles on ``key`` (totals agg + the ordered lag window), both
    partial-aggregated / per-key linear state.

    ``broadcast_totals`` (default True) forces the per-key (S, N) frame
    to broadcast — correct for the intended bounded key domains (event
    types, segments). For a HIGH-CARDINALITY key (user ids) the totals
    frame is key-domain-sized and a forced broadcast risks driver/
    executor OOM (the degree_assortativity lesson): pass False to fall
    back to a shuffle join, which then shares the window's hash
    partitioning on ``key``.
    """
    base = df.select(
        F.col(key), value_dec.alias("v"), *[F.col(c) for c in order_cols]
    )
    totals = base.groupBy(key).agg(
        F.sum("v").alias("s"), F.count("*").cast("bigint").alias("n_rows")
    )
    tagged = (
        base.join(F.broadcast(totals) if broadcast_totals else totals, key)
        .withColumn("side", F.col("v") * F.col("n_rows") - F.col("s"))
        .where(F.col("side") != 0)
        .withColumn("above", (F.col("side") > 0).cast("int"))
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    runs = tagged.withColumn(
        "new_run",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.lag("above").over(w) != F.col("above")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    agg = runs.groupBy(key).agg(
        F.sum("above").cast("bigint").alias("n_above"),
        (F.count("*") - F.sum("above")).cast("bigint").alias("n_below"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    n1, n2 = _d(F.col("n_above")), _d(F.col("n_below"))
    n = n1 + n2
    two_n1n2 = F.lit(2.0) * n1 * n2
    e_r = F.lit(1.0) + two_n1n2 / n
    var_r = two_n1n2 * (two_n1n2 - n) / (n * n * (n - F.lit(1.0)))
    # degenerate keys ({1 above, 1 below} gives 2*n1*n2 == N, a single
    # non-mean row gives N == 1) have Var[R] <= 0 and the z expression
    # is 0/0 -> NaN with ENGINE-DEPENDENT comparison semantics (DuckDB
    # orders NaN above every number); NULL is the defined answer (no
    # randomness information), mirrored in the oracle. The guard is
    # INTEGER-only — Var[R] > 0 iff both sides are populated and
    # 2*n1*n2 > n1+n2 — so it can never itself produce a NaN and agrees
    # bit-for-bit across engines.
    nondegenerate = (
        (F.col("n_above") > 0)
        & (F.col("n_below") > 0)
        & (
            F.lit(2) * F.col("n_above") * F.col("n_below")
            > F.col("n_above") + F.col("n_below")
        )
    )
    return agg.select(
        key,
        "n_above",
        "n_below",
        "n_runs",
        F.when(
            nondegenerate, (_d(F.col("n_runs")) - e_r) / F.sqrt(var_r)
        ).alias("z"),
    ).orderBy(key)


def anova_report(df: DataFrame, group: str, value_dec: Column) -> DataFrame:
    """One-way ANOVA over ``group``: F statistic and eta^2 effect size.

    Per-group (n, sum, sum-of-squares) accumulate exactly in
    BIGINT/DECIMAL (one partial-aggregated shuffle); the between/within
    decomposition SSB = sum_g s_g^2/n_g - S^2/N, SSW = SST - SSB closes
    in double over the k-row group frame (k-term double sums differ
    across engines only in association order — inside the protocol's
    6-decimal rounding).

    Degenerate inputs (one group, k = n_total, or zero within/total
    variance) would otherwise hit 0/0 with ENGINE-DEPENDENT results
    (Spark NULL on divide-by-zero, DuckDB IEEE inf/NaN): f_stat is
    guarded by (k > 1 AND n_total > k AND ssw > 0) and eta_squared by
    (sst > 0), NULL otherwise. The variance guards compare the SAME
    double expression tree both engines evaluate (exact decimal sums →
    correctly-rounded casts → identical ops → bit-identical doubles), so
    the guard decision itself cannot diverge — the runs-test
    nondegenerate-guard discipline, extended to float-exact comparisons.
    """
    per_g = df.groupBy(group).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(value_dec).alias("s"),
        F.sum(value_dec * value_dec).alias("ss"),
    )
    agg = per_g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(_d(F.col("s")) * _d(F.col("s")) / _d(F.col("n"))).alias("sum_sq_over_n"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
    )
    ssb = F.col("sum_sq_over_n") - _d(F.col("s_tot")) * _d(F.col("s_tot")) / _d(
        F.col("n_total")
    )
    sst = _d(F.col("ss_tot")) - _d(F.col("s_tot")) * _d(F.col("s_tot")) / _d(
        F.col("n_total")
    )
    ssw = sst - ssb
    f_stat = (ssb / (_d(F.col("k")) - F.lit(1.0))) / (
        ssw / (_d(F.col("n_total")) - _d(F.col("k")))
    )
    f_ok = (F.col("k") > 1) & (F.col("n_total") > F.col("k")) & (ssw > F.lit(0.0))
    return agg.select(
        "k",
        "n_total",
        F.when(f_ok, f_stat).alias("f_stat"),
        F.when(sst > F.lit(0.0), ssb / sst).alias("eta_squared"),
    )


def permutation_mean_test(
    df: DataFrame,
    key: Column,
    value_dec: Column,
    flag: Column,
    n_replicates: int = 200,
    salt: str = "perm1",
) -> DataFrame:
    """Hash-deterministic randomization test for a difference in means.

    The classic permutation test shuffles labels with group sizes fixed —
    a global shuffle-and-split that doesn't distribute. This is the
    RANDOM-REASSIGNMENT variant (approximate randomization test): each
    replicate b reassigns every row by the parity of
    md5(key || ':' || b || ':' || salt), a fair coin. Group sizes then
    vary binomially around n/2, which the replicate's own mean-difference
    statistic absorbs; the null distribution is exchangeable-equivalent
    for mean differences and the whole procedure is embarrassingly
    parallel AND bit-reproducible across engines (md5 both sides).

    p = (1 + #{ |diff_b| >= |diff_obs| }) / (B + 1)  (add-one rule).

    The comparison is bit-exact: every diff is (decimal-sum / bigint) -
    (decimal-sum / bigint) — two correctly-rounded divisions and one
    subtraction over exact sums, the identical expression tree in the
    oracle. Replicate fan-out is a generator-side explode that partial-
    aggregates to 2B rows before the only shuffle; observed means are one
    more tiny aggregate.

    Hash budget (the order_price_bootstrap_ci lesson, ROUND4_NOTES):
    rows x B md5 calls on a single-file scan ran one-core at 30M hashes.
    Two fixes baked in: the base fans out over the cluster BEFORE the
    replicate explode (fan_out — a no-op at real scale where the file
    count parallelizes the scan), and each md5 yields SIXTY coins, not
    one — the first 15 hex chars (60 bits, exact in int64) are a coin
    WORD for replicates [60*blk, 60*blk+59], bit i = (word >> i) & 1.
    The hash count drops 60x; the oracle extracts the identical bits
    from the identical words.
    """
    from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out

    base = df.select(
        key.cast("string").alias("k"), value_dec.alias("v"), flag.alias("in_a")
    )
    obs = base.agg(
        (
            _d(F.sum(F.when(F.col("in_a"), F.col("v")))) / _d(F.count_if("in_a"))
            - _d(F.sum(F.when(~F.col("in_a"), F.col("v"))))
            / _d(F.count_if(~F.col("in_a")))
        ).alias("obs_diff")
    )
    n_blocks = (n_replicates + 59) // 60
    word = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("k"), F.col("blk"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    per_rep = (
        fan_out(base)
        .select(
            "k",
            "v",
            F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
        )
        .withColumn("word", word)
        .select(
            "v",
            "word",
            F.col("blk"),
            F.explode(
                F.expr(f"sequence(0, least(59, {n_replicates - 1} - blk * 60))")
            ).alias("i"),
        )
        .select(
            "v",
            (F.col("blk") * 60 + F.col("i")).alias("b"),
            F.expr("cast(shiftright(word, i) & 1 as int)").alias("side"),
        )
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("side") == 1, F.col("v"))).alias("s1"),
            F.count_if(F.col("side") == 1).alias("n1"),
            F.sum(F.when(F.col("side") == 0, F.col("v"))).alias("s0"),
            F.count_if(F.col("side") == 0).alias("n0"),
        )
        .where((F.col("n1") > 0) & (F.col("n0") > 0))
        .select(
            (_d(F.col("s1")) / _d(F.col("n1")) - _d(F.col("s0")) / _d(F.col("n0"))).alias(
                "diff"
            )
        )
    )
    tally = per_rep.crossJoin(F.broadcast(obs)).agg(
        F.count("*").cast("bigint").alias("n_replicates"),
        F.sum((F.abs(F.col("diff")) >= F.abs(F.col("obs_diff"))).cast("int"))
        .cast("bigint")
        .alias("n_ge"),
        F.first("obs_diff").alias("obs_diff"),
    )
    # a global agg always emits one row; the oracle's GROUP BY emits
    # ZERO when no replicate survives (empty input, or a degenerate
    # corpus where every coin lands one-sided) — align the shapes
    return tally.where(F.col("n_replicates") > 0).select(
        "obs_diff",
        "n_replicates",
        "n_ge",
        (
            (_d(F.col("n_ge")) + F.lit(1.0))
            / (_d(F.col("n_replicates")) + F.lit(1.0))
        ).alias("p_value"),
    )


def bh_fdr_report(
    df: DataFrame, group: str, value_dec: Column, alpha: float = 0.05
) -> DataFrame:
    """Per-group Welch z of the group mean against the complement, with
    Benjamini-Hochberg FDR control across the battery.

    Exact (n, sum, sum-sq) per group plus the grand totals give each
    group's complement moments by subtraction (decimal-exact). The Welch
    z closes in double; its two-sided p uses normal_sf_two_sided. BH then
    ranks p ascending (group name tie-break) and rejects ranks
    1..max{ i : p_(i) <= (i/m)*alpha } via a suffix-max window over the
    m-row battery frame.

    One partial-aggregated shuffle on ``group``; everything after runs on
    m rows.

    Degenerate groups (n = 1, complement of size <= 1, zero pooled
    variance) get NULL z/p under an engine-portable guard and rank LAST
    in the BH order (explicit NULLS LAST both engines); they are still
    counted in m (they are hypotheses — they just carry no evidence) and
    can never reject.
    """
    per_g = df.groupBy(group).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(value_dec).alias("s"),
        F.sum(value_dec * value_dec).alias("ss"),
    )
    tot = per_g.agg(
        F.sum("n").cast("bigint").alias("n_t"),
        F.sum("s").alias("s_t"),
        F.sum("ss").alias("ss_t"),
        F.count("*").cast("bigint").alias("m"),
    )
    j = per_g.crossJoin(F.broadcast(tot))
    n_g, n_r = _d(F.col("n")), _d(F.col("n_t") - F.col("n"))
    s_g, s_r = _d(F.col("s")), _d(F.col("s_t") - F.col("s"))
    ss_g, ss_r = _d(F.col("ss")), _d(F.col("ss_t") - F.col("ss"))
    var_g = (ss_g - s_g * s_g / n_g) / (n_g - F.lit(1.0))
    var_r = (ss_r - s_r * s_r / n_r) / (n_r - F.lit(1.0))
    denom = var_g / n_g + var_r / n_r
    # degenerate-group guard: a singleton group (n = 1), a singleton
    # complement (n_t - n = 1, incl. the m = 1 battery), or zero pooled
    # variance would hit 0/0 / x/0 with ENGINE-DEPENDENT semantics (Spark
    # NULL, DuckDB IEEE inf/NaN). The integer conditions are exact; the
    # denom > 0 comparison runs on the SAME double expression tree both
    # engines evaluate from exact decimal sums, so it is bit-identical
    # too (and it excludes sqrt-of-negative when the true variance is 0
    # but the double rounds tiny-negative). NULL z/p is the defined
    # answer; the BH ranks place NULL p LAST (pinned below) and such
    # rows can never reject.
    z_ok = (
        (F.col("n") > 1) & (F.col("n_t") - F.col("n") > 1) & (denom > F.lit(0.0))
    )
    z = F.when(z_ok, (s_g / n_g - s_r / n_r) / F.sqrt(denom))
    scored = j.select(
        group,
        F.col("n"),
        F.col("m"),
        z.alias("z"),
        normal_sf_two_sided(F.abs(z)).alias("p_value"),
    )
    # p contains exp() — the one non-correctly-rounded primitive — so the
    # DISCRETE decisions (rank order, p <= critical) must not ride on its
    # last ulp: both run on p rounded to 9 decimals (the rag_chunk_bm25
    # engine-portable-cut discipline). A decision flip now needs the true
    # p within ~1e-16 of a 0.5e-9 rounding boundary; the reported p_value
    # column stays unrounded (the protocol's 6-decimal canon covers it).
    p9 = F.round(F.col("p_value"), 9).alias("__p9")
    scored = scored.withColumn("__p9", p9)
    # NULLS LAST is pinned explicitly: Spark's ascending default is
    # nulls-FIRST, DuckDB's is nulls-LAST — guarded-NULL p rows must
    # rank after every real p in both engines
    w_rank = Window.orderBy(F.col("__p9").asc_nulls_last(), group)
    ranked = scored.withColumn("i", F.row_number().over(w_rank)).withColumn(
        "bh_critical", _d(F.col("i")) / _d(F.col("m")) * F.lit(alpha)
    )
    w_all = Window.orderBy(F.col("__p9").asc_nulls_last(), group).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    flagged = ranked.withColumn(
        "max_reject_rank",
        F.max(
            F.when(
                F.col("__p9") <= F.round(F.col("bh_critical"), 9), F.col("i")
            ).otherwise(F.lit(0))
        ).over(w_all),
    )
    return flagged.select(
        group,
        "n",
        "z",
        "p_value",
        "bh_critical",
        (F.col("i") <= F.col("max_reject_rank")).alias("rejected"),
    ).orderBy(group)


def bivariate_outlier_report(
    df: DataFrame,
    id_col: str,
    x_dec: Column,
    y_dec: Column,
    cutoff: float = CHI2_2DF_999,
) -> DataFrame:
    """Mahalanobis-distance outliers in two dimensions, closed form.

    The 2x2 sample covariance inverts symbolically, so no linear-algebra
    library enters the plan: with exact decimal sums (sx, sy, sxx, sxy,
    syy; n) and the scatter terms Sxx = sxx - sx^2/n (etc.),

        d^2 = (n-1) * (dx^2*Syy - 2*dx*dy*Sxy + dy^2*Sxx)
                    / (Sxx*Syy - Sxy^2)

    The moment frame is ONE row, broadcast back over the corpus — a
    map-side pass, no second shuffle. Every double derives from exact
    sums through a fixed expression tree, so the cutoff flag (chi^2_2
    0.999 by default) is bit-deterministic across engines.
    """
    base = df.select(F.col(id_col), x_dec.alias("x"), y_dec.alias("y"))
    mom = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    joined = base.crossJoin(F.broadcast(mom))
    n = _d(F.col("n"))
    mx, my = _d(F.col("sx")) / n, _d(F.col("sy")) / n
    s_xx = _d(F.col("sxx")) - _d(F.col("sx")) * _d(F.col("sx")) / n
    s_xy = _d(F.col("sxy")) - _d(F.col("sx")) * _d(F.col("sy")) / n
    s_yy = _d(F.col("syy")) - _d(F.col("sy")) * _d(F.col("sy")) / n
    dx, dy = _d(F.col("x")) - mx, _d(F.col("y")) - my
    d2 = (
        (n - F.lit(1.0))
        * (dx * dx * s_yy - F.lit(2.0) * dx * dy * s_xy + dy * dy * s_xx)
        / (s_xx * s_yy - s_xy * s_xy)
    )
    return (
        joined.select(F.col(id_col), _d(F.col("x")).alias("x"), _d(F.col("y")).alias("y"), d2.alias("d2"))
        .where(F.col("d2") > F.lit(cutoff))
        .orderBy(id_col)
    )


def grouped_spearman(
    df: DataFrame, group: str, x: Column, y: Column
) -> DataFrame:
    """Spearman rank correlation per group: Pearson correlation over
    midranks (rank() min-rank + half the tie width — the standard
    average-tie rank, exact in double since ranks are integers/2).

    Rank assignment is two ordered windows per group key (same hash
    partitioning, two sorts); the closing corr() is one partial-
    aggregated moment pass. Nothing leaves the group's partition, and
    per-group state is O(1) — the monotone-association complement to the
    parametric corr in event_value_stats.
    """
    base = df.select(F.col(group), x.alias("x"), y.alias("y"))
    wx = Window.partitionBy(group).orderBy("x")
    wy = Window.partitionBy(group).orderBy("y")
    tx = Window.partitionBy(group, "x")
    ty = Window.partitionBy(group, "y")
    ranked = base.select(
        group,
        (
            _d(F.rank().over(wx))
            + (_d(F.count("*").over(tx)) - F.lit(1.0)) / F.lit(2.0)
        ).alias("rx"),
        (
            _d(F.rank().over(wy))
            + (_d(F.count("*").over(ty)) - F.lit(1.0)) / F.lit(2.0)
        ).alias("ry"),
    )
    return (
        ranked.groupBy(group)
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.corr("rx", "ry").alias("spearman_rho"),
        )
        .orderBy(group)
    )
