"""Warehouse-lifecycle operators: CDC merge (upsert), type-2 slowly-
changing dimensions, column profiling, and referential-integrity QA.

The reference is a batch star-schema builder (dims/fact at
/root/reference/src/etl_imdb.py:152-193) whose only data-quality tooling
is `--show-counts` row counts (src/etl_imdb.py:286-297) and whose only
update story is "rebuild everything". A warehouse that ingests
continuously needs the missing lifecycle half:

- ``merge_upsert``   — apply a change set to a base table (UPDATE on key
  match, INSERT otherwise) — the MERGE INTO of lakehouse engines,
  expressed as one full-outer join.
- ``scd2``           — compress an ordered change log into type-2
  dimension versions (valid_from / valid_to / is_current), the Kimball
  pattern the reference's static dims would need under real churn.
- ``column_profile`` — per-column null/distinct/min/max profile, the
  generalization of the reference's show-counts QA.
- ``orphan_check``   — referential-integrity audit: child keys with no
  parent (the fact⋈dim contract the reference assumes but never checks).
- ``heavy_hitters``  — exact frequent-key detection with a share
  threshold; at scale this is the skew detector that decides which keys
  need salting (operators/skew.py).

Scale notes: merge/scd2 shuffle once on the business key; profile is a
single scan (one Expand for the multi-distinct aggregate); orphan_check
is a left-anti equi-join per relationship (Catalyst broadcasts the
parent side when small); heavy_hitters is one partial-aggregated groupBy
plus a single-row broadcast for the total.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, changes: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert ``changes`` into ``base`` on ``keys``: rows present in both
    take the change row's values (last-writer-wins), change-only rows are
    inserted, base-only rows carry through. Both frames must share one
    schema (enforced; MERGE with heterogeneous schemas is a different op).

    One full-outer shuffle join on the key — at 100 TB pair this with
    identical bucketing of base and changes (sources/bucketing.py) so the
    merge is shuffle-free, and land the result with dynamic partition
    overwrite (session.py) to rewrite only touched partitions.
    """
    if set(base.columns) != set(changes.columns):
        raise ValueError(
            f"merge_upsert: schema mismatch base={sorted(base.columns)} "
            f"changes={sorted(changes.columns)}"
        )
    # a change row wins WHOLE (MERGE semantics — an update may legitimately
    # set a column to NULL), so pick sides on a presence marker, never by
    # per-column coalesce. String-qualified alias refs ("b.x"/"c.x"): base
    # and changes often share lineage (changes derived from base), where
    # DataFrame-indexed columns are ambiguous.
    b = base.alias("__mb")
    c = changes.withColumn("__present", F.lit(True)).alias("__mc")
    cond = [F.col(f"__mb.{k}").eqNullSafe(F.col(f"__mc.{k}")) for k in keys]
    present = F.col("__mc.__present").isNotNull()
    picked = [
        F.when(present, F.col(f"__mc.{col}")).otherwise(F.col(f"__mb.{col}")).alias(col)
        for col in base.columns
    ]
    return b.join(c, cond, "full_outer").select(*picked)


def scd2(
    log: DataFrame,
    key: str,
    attrs: list[str],
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 dimension from an ordered change log: one output row per
    (key, consecutive run of identical ``attrs``), with
    ``valid_from`` / ``valid_to`` (half-open; NULL = current) and
    ``is_current``. ``tiebreak_col`` makes the within-key ordering total,
    so versions are deterministic even when ``order_col`` ties.

    Window-only (no self-join): detect run starts with lag() over the
    key-partitioned order, keep the run-start rows, then lead() gives
    each version its closing edge. Two window passes over one shuffle
    of (key, attrs, order) — at scale this moves only the change log,
    never the dimension payload.
    """
    w = Window.partitionBy(key).orderBy(order_col, tiebreak_col)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    runs = (
        log.withColumn("__is_start", F.lag(order_col).over(w).isNull() | changed)
        .where("__is_start")
        .drop("__is_start")
    )
    w2 = Window.partitionBy(key).orderBy(order_col, tiebreak_col)
    out = runs.select(
        key,
        *attrs,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w2).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column QA profile: (col_name, n_rows, n_null, n_distinct,
    min_value, max_value) — one row per profiled column, min/max
    stringified AFTER the typed aggregate (numeric min, then cast).

    Single scan: all aggregates run in one groupBy-less agg (Spark plans
    the multi-column exact distinct via one Expand — #cols× map-side
    rows, still one pass over storage), then a literal-array posexplode
    pivots wide→long driver-free. The at-scale variant swaps
    count_distinct for approx_count_distinct — estimates can't
    hash-match an oracle, so the exact form is the checkable default.
    """
    aggs: list = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def orphan_check(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit. Each relationship is
    (name, child_df, fk_col, parent_df, pk_col); the output is one row
    per relationship: (relationship, n_child, n_orphans) where orphans
    are child rows whose non-null FK matches no parent PK.

    Per relationship: one anti equi-join (parent side reduced to
    distinct keys — broadcast by Catalyst when small) and one count
    aggregate; the union of single-row results is driver-free.
    """
    checks = []
    for name, child, fk, parent, pk in relationships:
        keys = parent.select(F.col(pk).alias(fk)).distinct()
        non_null = child.where(F.col(fk).isNotNull())
        orphans = non_null.join(keys, fk, "left_anti")
        checks.append(
            non_null.agg(F.count("*").alias("n_child")).crossJoin(
                orphans.agg(F.count("*").alias("n_orphans"))
            ).select(F.lit(name).alias("relationship"), "n_child", "n_orphans")
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def merge_partial_aggregates(
    parts: list[DataFrame],
    keys: list[str],
    merge_exprs: dict[str, Column],
) -> DataFrame:
    """Incremental-aggregation maintenance: combine already-aggregated
    partial states (yesterday's materialized KPI + today's delta batch)
    into the aggregate a full recompute would produce — the materialized-
    view refresh pattern. Only works for decomposable aggregates (count/
    sum re-add, min/max re-min/max, HLL sketches re-union); the caller
    supplies the merge expression per output column.

    At 100 TB this is THE pattern that keeps daily KPIs cheap: each
    refresh re-aggregates one day of partials, never the full history.
    One union (no shuffle) + one partially-aggregated groupBy on the
    keys; the inputs are already aggregate-sized, so the shuffle moves
    key-cardinality rows, not event rows."""
    if not parts:
        raise ValueError("merge_partial_aggregates needs at least one part")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_exprs.items()]
    )


def sketch_distinct_rollup(
    df: DataFrame,
    key_cols: list[str],
    sub_col: Column | str,
    item_col: str,
) -> DataFrame:
    """Mergeable distinct-count rollup: build one HLL sketch (Apache
    DataSketches, ``hll_sketch_agg``) per (key, sub-bucket), then union
    the sketches per key and estimate. Unioning per-bucket sketches
    carries the same accuracy class as sketching the raw stream (the
    union operates on the same register space; tests/test_warehouse.py
    bounds both against the exact distinct), which is the property that
    lets a 100 TB pipeline keep per-day sketches and answer per-month
    distincts WITHOUT rescanning: re-aggregation touches sketch-count
    rows, not events.

    Estimates are implementation-specific (can't hash-match another
    engine), so queries built on this are rows-only for the oracle;
    the local test bounds the error against the exact distinct."""
    sub = F.col(sub_col) if isinstance(sub_col, str) else sub_col
    per_bucket = (
        df.select(*key_cols, sub.alias("__sub"), F.col(item_col).alias("__item"))
        .groupBy(*key_cols, "__sub")
        .agg(
            F.hll_sketch_agg("__item").alias("__sk"),
            F.count("*").alias("__n"),
        )
    )
    return (
        per_bucket.groupBy(*key_cols)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("approx_distinct"),
            F.sum("__n").alias("n_rows"),
            F.count("*").alias("n_buckets"),
        )
        .orderBy(*key_cols)
    )


def heavy_hitters(
    df: DataFrame, key_cols: list[str], min_share: float
) -> DataFrame:
    """Exact frequent keys: every key group holding at least ``min_share``
    of all rows, with its count and share. One partially-aggregated
    groupBy (map-side combine collapses the hot keys before the shuffle
    — the skew that makes the key "heavy" is exactly what partial
    aggregation absorbs) plus a broadcast of the single-row total.
    Downstream, keys found here are the salting candidates for
    operators/skew.py.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    total = df.agg(F.count("*").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("__total"))
        .where(F.col("share") >= min_share)
        .drop("__total")
    )


def cms_sketch(
    df: DataFrame, key_col: str, d: int = 4, w: int = 64
) -> DataFrame:
    """Count-min sketch as a pure DataFrame aggregate: ``d`` independent
    hash rows of ``w`` counters — at most d*w output rows regardless of
    input size or key cardinality (the bounded-memory frequency summary;
    Cormode & Muthukrishnan 2005, public).

    Declarative construction: each input row explodes into d (seed,
    bucket) cells (bucket = md5-derived uniform hash of key:seed mod w)
    and ONE partially-aggregated groupBy counts them — the sketch is
    mergeable for free because partial aggregation IS the merge. No UDF,
    no driver state, one shuffle of at most d*w distinct keys.
    """
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform

    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    cells = df.select(F.col(key_col).cast("string").alias("__k")).select(
        "__k", seeds
    )
    cells = cells.withColumn(
        "__h", F.md5(F.concat("__k", F.lit(":"), F.col("seed").cast("string")))
    )
    return (
        cells.select("seed", (hex_uniform("__h", 4) % w).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 64
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: estimate =
    min over the d rows of the key's bucket counter (an upper bound on
    the true count, within eps*N with probability 1-delta for
    w=ceil(e/eps), d=ceil(ln(1/delta))).

    The sketch side is at most d*w rows — broadcast — so estimation is a
    map-only pass over the key set."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform

    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    probes = (
        keys.select(F.col(key_col).cast("string").alias("__k"))
        .distinct()
        .select("__k", seeds)
        .withColumn(
            "__h", F.md5(F.concat("__k", F.lit(":"), F.col("seed").cast("string")))
        )
        .select("__k", "seed", (hex_uniform("__h", 4) % w).alias("bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .select(F.col("__k").alias(key_col), F.col("est").cast("bigint"))
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Row-level diff between two table versions keyed by ``keys``:
    ADDED (key only in new), REMOVED (key only in old), CHANGED (key in
    both, any non-key column differs — null-safely), UNCHANGED. The
    audit/regression primitive behind snapshot reconciliation and
    time-travel comparisons.

    One full-outer join on the key (single co-partitioned shuffle pair);
    change detection compares md5-of-per-column-digests so arbitrarily
    wide rows diff with ONE string compare per side. Each non-null value
    contributes its own fixed-width md5 digest (32 hex chars) and NULL
    contributes the single marker 'N' — 'N' is not a hex character, so
    the concatenation is a prefix-free encoding: no value content can
    shift across column boundaries (a '\\x00V'-sentinel concat scheme
    could collide on values containing the sentinel)."""
    non_key = [c for c in old.columns if c not in keys]
    if [c for c in new.columns if c not in keys] != non_key:
        raise ValueError("old/new schemas must match")

    def fp(df: DataFrame) -> Column:
        parts = []
        for c in non_key:
            parts.append(
                F.when(F.col(c).isNull(), F.lit("N"))
                .otherwise(F.md5(F.col(c).cast("string")))
            )
        return F.md5(F.concat(*parts)) if parts else F.lit("")

    o = old.select(*keys, fp(old).alias("__old_fp"))
    n = new.select(*keys, fp(new).alias("__new_fp"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__old_fp").isNull(), F.lit("ADDED"))
        .when(F.col("__new_fp").isNull(), F.lit("REMOVED"))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("CHANGED"))
        .otherwise(F.lit("UNCHANGED"))
    )
    return j.select(*keys, status.alias("status"))


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct-count sketch rows: per group, the ``k``
    smallest 48-bit hashes of the distinct values (Bar-Yossef et al.
    2002, public). Unlike HLL/CMS, KMV built on a FIXED hash (md5) is
    bit-deterministic — the sketch itself, not just its error bound, is
    oracle-checkable, and merging two sketches is just re-running this
    function over their union (the k smallest of two k-smallest sets).

    Output: (group..., h, rk) with rk in 1..k ascending by hash.

    Physical shape: dropDuplicates partially aggregates (group, hash)
    map-side, then rank<=k compiles to WindowGroupLimit — each partition
    keeps k rows per group before the shuffle, so the wire carries
    O(groups * k), never the distinct-value set."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform
    from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group

    hashed = (
        df.select(
            *group_cols,
            F.md5(F.concat(F.col(value_col).cast("string"), F.lit(":kmv"))).alias(
                "__h"
            ),
        )
        .select(*group_cols, hex_uniform("__h", 12).alias("h"))
        .dropDuplicates([*group_cols, "h"])
    )
    return top_k_per_group(hashed, group_cols, [F.asc("h")], k)


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Distinct-count estimates from KMV sketch rows: exact count when a
    group has fewer than ``k`` distinct hashes (the sketch IS the value
    set), else (k-1) / u_k with u_k the k-th smallest hash normalized to
    (0, 1]. Pure integer aggregation plus one double divide — the same
    IEEE operations in any engine, so estimates hash-match the oracle."""
    m = float(16**12)
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(m))
    )
    return agg.select(
        *group_cols, "n_kept", "kth_hash", est.alias("est_distinct")
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row k-anonymity report over the quasi-identifier columns:
    every equivalence class (distinct quasi-identifier combination) with
    fewer than ``k`` members re-identifies its rows. Output:
    (n_groups, violating_groups, rows_at_risk, min_group_size,
    max_group_size) — the release-gate numbers a privacy review asks for.

    Two aggregations, both partial-aggregated: groupBy(quasi) collapses
    map-side to the equivalence classes (bounded by the quasi-identifier
    domain, not the row count), then a constant-size global re-aggregate.
    NULL quasi-values form their own class (groupBy NULL semantics), the
    conservative choice — an all-NULL row still counts toward risk."""
    groups = df.groupBy(*quasi_cols).agg(F.count("*").alias("__n"))
    viol = F.col("__n") < k
    return groups.agg(
        F.count("*").alias("n_groups"),
        # coalesce: an EMPTY input yields a (0, 0, 0, NULL, NULL) report,
        # not NULL counters — zero rows at risk is a statement, not
        # missing data (min/max stay NULL: there is no group size)
        F.coalesce(F.sum(viol.cast("bigint")), F.lit(0)).alias(
            "violating_groups"
        ),
        F.coalesce(
            F.sum(F.when(viol, F.col("__n")).otherwise(F.lit(0))), F.lit(0)
        ).alias("rows_at_risk"),
        F.min("__n").alias("min_group_size"),
        F.max("__n").alias("max_group_size"),
    )


def l_diversity_audit(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """One-row l-diversity report: an equivalence class (distinct
    quasi-identifier combination) is safe only when its members carry at
    least ``l`` DISTINCT sensitive values — the refinement of k-anonymity
    that catches the homogeneous class whose size is fine but whose
    sensitive attribute is unanimous (Machanavajjhala et al. 2007).
    Output: (n_groups, violating_groups, rows_at_risk, min_distinct,
    max_distinct).

    Shape mirrors k_anonymity_audit: distinct-per-group via a two-level
    aggregation — dropDuplicates(quasi + sensitive) partially aggregates
    map-side, the per-class distinct count is then an exact count, and
    the final report is a constant-size global re-aggregate. No
    countDistinct shuffle of raw rows."""
    sizes = df.groupBy(*quasi_cols).agg(F.count("*").alias("__rows"))
    distincts = (
        df.dropDuplicates([*quasi_cols, sensitive_col])
        .groupBy(*quasi_cols)
        .agg(F.count("*").alias("__ndist"))
    )
    groups = sizes.join(distincts, quasi_cols)
    viol = F.col("__ndist") < l
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.coalesce(F.sum(viol.cast("bigint")), F.lit(0)).alias(
            "violating_groups"
        ),
        F.coalesce(
            F.sum(F.when(viol, F.col("__rows")).otherwise(F.lit(0))), F.lit(0)
        ).alias("rows_at_risk"),
        F.min("__ndist").alias("min_distinct"),
        F.max("__ndist").alias("max_distinct"),
    )


def kmv_jaccard_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Estimated Jaccard overlap between every pair of groups' distinct
    value sets, from KMV sketches (the k-minimum-values set-operation
    trick: the k smallest hashes of A ∪ B are a uniform sample of the
    union, so the fraction of them present in BOTH sketches estimates
    |A∩B| / |A∪B|). Audience-overlap analytics — "how many distinct
    users do these event types share" — without ever shuffling the
    distinct sets pairwise.

    Output: (group_a, group_b, n_union_kept, n_both, jaccard_est) for
    group_a < group_b.

    Scale shape: everything downstream of kmv_sketch runs on sketch rows
    (groups x k — KBs however big the data); the pair enumeration is a
    broadcast self-join of the GROUP LIST, the union-sketch cut is a
    rank window that compiles to WindowGroupLimit. Deterministic md5
    hashing makes the ESTIMATE itself oracle-checkable, like
    kmv_estimate."""
    from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group

    sk = kmv_sketch(df, [group_col], value_col, k=k).select(
        F.col(group_col).alias("__g"), "h"
    )
    groups = sk.select("__g").distinct()
    pairs = (
        groups.select(F.col("__g").alias("group_a"))
        .crossJoin(F.broadcast(groups.select(F.col("__g").alias("group_b"))))
        .where(F.col("group_a") < F.col("group_b"))
    )
    side_a = pairs.join(sk, pairs.group_a == sk.__g).select(
        "group_a", "group_b", "h"
    )
    side_b = pairs.join(sk, pairs.group_b == sk.__g).select(
        "group_a", "group_b", "h"
    )
    membership = (
        side_a.unionByName(side_b)
        .groupBy("group_a", "group_b", "h")
        .agg(F.count("*").alias("__n"))
    )
    union_k = top_k_per_group(
        membership, ["group_a", "group_b"], [F.asc("h")], k
    )
    return (
        union_k.groupBy("group_a", "group_b")
        .agg(
            F.count("*").cast("bigint").alias("n_union_kept"),
            F.sum((F.col("__n") == 2).cast("bigint")).alias("n_both"),
        )
        .select(
            "group_a",
            "group_b",
            "n_union_kept",
            "n_both",
            (F.col("n_both").cast("double") / F.col("n_union_kept")).alias(
                "jaccard_est"
            ),
        )
        .orderBy("group_a", "group_b")
    )


def revenue_concentration(
    orders: DataFrame,
    thresholds: tuple[float, ...] = (0.01, 0.05, 0.10, 0.25),
    key_col: str = "o_custkey",
    value_col: str = "o_totalprice",
) -> DataFrame:
    """Pareto concentration report: for each top-x% of customers by
    total spend, (top_pct, n_top, revenue_top, share) — the whale-curve
    KPI behind "1% of users produce 40% of revenue" decisions, and the
    distribution-health check a sampling pipeline reads before assuming
    uniformity.

    Scale shape: per-key spend is ONE partial-aggregated groupBy; the
    global descending rank comes from ranks.total_order_ranks (range
    shuffle + broadcast partition offsets — the only partition-less
    window sees #partitions rows, never the data); all thresholds are
    CONDITIONAL SUMS in a single pass over the ranked frame, unpivoted
    to report rows. No TakeOrdered of a 1%-of-customers prefix (driver-
    sized at 100 TB), no per-threshold rescans.

    Exactness: spends accumulate in DECIMAL(28,12) (negated for the
    ascending rank order — negation is exact), cutoffs are
    greatest(1, floor(t*n)) on the identical double product, and shares
    are one double division each — oracle-backed."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import total_order_ranks

    spend = (
        orders.groupBy(F.col(key_col).alias("k"))
        .agg(F.sum(F.col(value_col).cast("decimal(28,12)")).alias("s"))
        .withColumn("neg_s", -F.col("s"))
    )
    n = spend.count()
    ranked = total_order_ranks(spend, ["neg_s", "k"])
    aggs = [F.sum("s").cast("double").alias("__total")]
    for i, t in enumerate(thresholds):
        k_cut = max(1, int(math.floor(t * n)))
        aggs.append(
            F.sum(F.when(F.col("global_rn") <= k_cut, F.col("s")))
            .cast("double")
            .alias(f"__rev{i}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("global_rn") <= k_cut, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__n{i}")
        )
    one = ranked.agg(*aggs)
    reports = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("top_pct"),
                F.col(f"__n{i}").cast("bigint").alias("n_top"),
                F.col(f"__rev{i}").alias("revenue_top"),
                (F.col(f"__rev{i}") / F.col("__total")).alias("share"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    return (
        one.select(F.explode(reports).alias("r"))
        .select("r.top_pct", "r.n_top", "r.revenue_top", "r.share")
        .orderBy("top_pct")
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    sample_shift: int = 4,
) -> DataFrame:
    """Join-cardinality estimation BEFORE running the join — the
    optimizer-observability primitive (hash sampling over the join key,
    the classic unbiased |A JOIN B| estimator): keys whose md5-uniform
    value falls in the bottom 1/2^sample_shift of the hash space carry
    their FULL per-side frequencies; est = 2^shift * sum(fA*fB) over the
    sampled keys. One row: (est_rows, exact_rows, rel_err).

    Because the sample is a KEY cut (not a row cut), fA*fB is exact for
    every surviving key and the estimator is unbiased with variance
    driven by key-frequency skew — precisely what you want to know
    before a 100 TB shuffle join. The exact side is computed the cheap
    way (frequency-vector dot product — sum of fA*fB over the key
    intersection), never by materializing the join.

    Everything is md5-determined integer arithmetic; the report is
    oracle-backed."""
    scale = 1 << sample_shift
    cut = (1 << 32) // scale
    fa = left.groupBy(F.col(left_key).alias("k")).agg(F.count("*").alias("fa"))
    fb = right.groupBy(F.col(right_key).alias("k")).agg(F.count("*").alias("fb"))
    u32 = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    sa = fa.where(u32 < cut)
    sb = fb.where(u32 < cut)
    est = sa.join(sb, "k").agg(
        (F.sum(F.col("fa") * F.col("fb")) * scale).alias("est_rows")
    )
    exact = fa.join(fb, "k").agg(
        F.sum(F.col("fa") * F.col("fb")).alias("exact_rows")
    )
    return est.crossJoin(exact).select(
        F.coalesce(F.col("est_rows"), F.lit(0)).cast("bigint").alias("est_rows"),
        F.col("exact_rows").cast("bigint").alias("exact_rows"),
        (
            F.abs(
                F.coalesce(F.col("est_rows"), F.lit(0)).cast("double")
                - F.col("exact_rows")
            )
            / F.col("exact_rows")
        ).alias("rel_err"),
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Pre-shuffle skew diagnostics — the report you run BEFORE a 100 TB
    groupBy/join on ``key_col`` to decide whether it needs salting or an
    AQE skew split (operators/skew.py / the AQE gate in
    tests/test_plan_quality.py are the remedies; this is the detector).

    Per hot key (top_n by frequency, key-string tiebreak): its row count,
    its share of all rows, and its skew factor cnt * n_keys / total_rows
    (1.0 = perfectly uniform; the max-task-to-mean-task ratio a hash
    shuffle on this key would see). NULL keys participate (they hash to
    one reducer too — the classic silent hot key).

    Physical shape: ONE partial-aggregated groupBy(key) -> a global
    TakeOrderedAndProject of top_n rows (no global sort, no window over
    data) -> one-row totals frame joined in (broadcast by size). Extends
    the reference's QA-count surface (SURVEY.md S2 A6,
    src/etl_imdb.py:287-297) from table-level to key-level volumetrics."""
    freq = df.groupBy(F.col(key_col).cast("string").alias("key_value")).agg(
        F.count("*").alias("cnt")
    )
    totals = freq.agg(
        F.sum("cnt").alias("__total_rows"),
        F.count("*").alias("__n_keys"),
    )
    top = freq.orderBy(F.desc("cnt"), F.asc_nulls_first("key_value")).limit(top_n)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key_value",
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total_rows")).alias("row_share"),
            (
                (F.col("cnt") * F.col("__n_keys")).cast("double")
                / F.col("__total_rows")
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("cnt"), F.asc_nulls_first("key_value"))
    )


def hash_sample_quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    row_key_cols: list[str],
    k: int = 128,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Mergeable quantile sketch with a DETERMINISTIC hash-reservoir —
    the quantile member of the KMV family (kmv_sketch covers distinct
    counts): per group keep the k rows with the smallest md5(row key)
    and report exact interpolated quantiles OF THE SAMPLE as the
    estimates. Because the reservoir is content-defined (md5 order,
    value-independent — a uniform sample without replacement), the
    kept set, and therefore the ESTIMATE ITSELF, is bit-deterministic
    and hash-matches an external oracle — the property engine-native
    approx sketches (approx_percentile/t-digest) can't offer. Merge =
    re-sketch of the union (k-min of k-mins), same law as KMV; groups
    with <= k rows are sampled whole, so their estimates are EXACT.

    ``row_key_cols`` must identify rows (hashing the value would
    collapse duplicates and bias the multiset); standard error is the
    order-statistic bound ~ sqrt(q(1-q)/k) quantile-density⁻¹.

    Physical shape: map-side md5 + rank<=k compiles to WindowGroupLimit
    (each partition keeps k rows per group pre-shuffle, wire carries
    O(groups * k)); the percentile aggregate then runs on k-row groups,
    where its value buffer is bounded by construction."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import hex_uniform
    from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group

    # prefix-free row identity: concat of per-column md5 digests (fixed
    # width, so ('x', NULL) can never collide with (NULL, 'x') and values
    # containing separators can't shift across columns); rows with a NULL
    # key column are dropped — they have no stable identity to sample by
    key = F.concat(*[F.md5(F.col(c).cast("string")) for c in row_key_cols])
    not_null = F.lit(True)
    for c in row_key_cols:
        not_null = not_null & F.col(c).isNotNull()
    hashed = (
        df.where(not_null)
        .select(
            *group_cols,
            F.col(value_col).alias("__v"),
            F.md5(F.concat(key, F.lit(":qsketch"))).alias("__h"),
        )
        .select(*group_cols, "__v", hex_uniform("__h", 12).alias("h"))
    )
    sample = top_k_per_group(hashed, group_cols, [F.asc("h")], k)
    aggs = [F.count("*").alias("n_sample")] + [
        F.expr(f"percentile(__v, {q!r})").alias(f"p{int(q * 100)}_est")
        for q in quantiles
    ]
    return sample.groupBy(*group_cols).agg(*aggs)


def expectation_report(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    min_pass_rate: float = 1.0,
) -> DataFrame:
    """Declarative data-contract check (the Great-Expectations pattern as
    ONE aggregate): each rule is (name, boolean Column); the report gives
    per rule the rows evaluated (NULL predicate results count as
    violations — 3VL must not let unknowns pass a contract), violations,
    pass rate, and the gate verdict pass_rate >= min_pass_rate. This is
    the ASSERTION side of data quality — column_profile describes a
    table, this enforces a contract on it, the step a pipeline runs
    before publishing a table version (or between merge_upsert and the
    snapshot swap).

    Physical shape: every rule compiles to one conditional sum inside a
    SINGLE partially-aggregated pass over the table — R rules cost one
    scan, not R jobs — then a constant-size stack unpivot to rows (same
    shape as the Gopher quality funnel). Rule order is preserved in
    rule_idx so reports diff stably across runs."""
    if not rules:
        raise ValueError("expectation_report needs at least one rule")
    aggs = []
    for i, (name, cond) in enumerate(rules):
        ok = F.coalesce(cond.cast("boolean"), F.lit(False))
        aggs.append(F.count("*").alias(f"__n{i}"))
        aggs.append(F.sum((~ok).cast("bigint")).alias(f"__v{i}"))
    one = df.agg(*aggs)
    # rule names land inside a SQL string literal — escape quotes so a
    # name like "price isn't null" can't terminate the literal
    stack_args = ", ".join(
        f"{i}, '{name.replace(chr(39), chr(39) * 2)}', __n{i}, __v{i}"
        for i, (name, _) in enumerate(rules)
    )
    return (
        one.select(
            F.expr(
                f"stack({len(rules)}, {stack_args}) AS "
                "(rule_idx, rule, n_rows, n_violations)"
            )
        )
        .select(
            "rule_idx",
            "rule",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            (
                (F.col("n_rows") - F.col("n_violations")).cast("double")
                / F.col("n_rows")
            ).alias("pass_rate"),
            (
                (F.col("n_rows") - F.col("n_violations")).cast("double")
                / F.col("n_rows")
                >= F.lit(min_pass_rate)
            ).alias("passed"),
        )
        .orderBy("rule_idx")
    )


def incremental_join_delta(
    a_base: DataFrame,
    a_delta: DataFrame,
    b_base: DataFrame,
    b_delta: DataFrame,
    key: str,
) -> DataFrame:
    """Incremental maintenance of an inner-join view under INSERT-only
    deltas — the join counterpart of merge_partial_aggregates (which
    refreshes aggregate views): the new rows of J = A ⋈ B after batches
    ΔA, ΔB arrive are exactly

        ΔJ  =  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (the bilinearity of ⋈ over union; tested as J(A∪ΔA, B∪ΔB) ==
    J(A, B) ∪ ΔJ with no overlap). Refreshing by recomputing the view
    rescans and RE-SHUFFLES both base tables; this touches each base
    once with the (batch-sized) delta BROADCAST against it — at 100 TB
    the refresh is two map-only scans plus a delta×delta join, no
    Exchange of anything base-sized, and cost scales with the delta,
    not the view.

    Assumes batch keys are new OR joins are append-semantics (insert
    only — updates/deletes need the signed-multiplicity generalization;
    CDC upserts are merge_upsert's job)."""
    d1 = F.broadcast(a_delta).join(b_base, key)
    d2 = a_base.join(F.broadcast(b_delta), key)
    d3 = a_delta.join(F.broadcast(b_delta), key)
    return d1.unionByName(d2).unionByName(d3)


def signed_join_delta(
    a_base: DataFrame,
    a_delta: DataFrame,
    b_base: DataFrame,
    b_delta: DataFrame,
    key: str,
    sign_col: str = "sign",
) -> DataFrame:
    """General incremental join maintenance — updates and DELETES, not
    just inserts — via signed multiplicities (the Z-set/DBSP device,
    public: Budiu et al. 2023): a delta row carries ``sign`` +1 (insert)
    or -1 (retract); an update is a -1 on the old row plus a +1 on the
    new one. The join delta is the same bilinear expansion as
    incremental_join_delta, with output sign = product of input signs
    (base rows are implicitly +1). Applying ΔJ = summing multiplicities
    per row and keeping rows with net multiplicity > 0 — apply_signed()
    below — reproduces the full recompute exactly (tested with random
    mixed insert/retract/update batches).

    Same physical shape as the insert-only case: deltas broadcast, bases
    are touched once each, map-only, no base-table Exchange."""
    a_d = a_delta.withColumnRenamed(sign_col, "__sa")
    b_d = b_delta.withColumnRenamed(sign_col, "__sb")
    d1 = (
        F.broadcast(a_d)
        .join(b_base, key)
        .withColumn(sign_col, F.col("__sa"))
        .drop("__sa")
    )
    d2 = (
        a_base.join(F.broadcast(b_d), key)
        .withColumn(sign_col, F.col("__sb"))
        .drop("__sb")
    )
    d3 = (
        a_d.join(F.broadcast(b_d), key)
        .withColumn(sign_col, F.col("__sa") * F.col("__sb"))
        .drop("__sa", "__sb")
    )
    return d1.unionByName(d2).unionByName(d3)


def apply_signed(view: DataFrame, delta: DataFrame, sign_col: str = "sign") -> DataFrame:
    """Fold a signed delta into a (multiplicity-1) view: per full row,
    net multiplicity = 1 (if in the view) + sum of delta signs; rows
    with net > 0 survive. One groupBy on the row itself — the apply step
    shuffles only view ∪ delta rows for the touched keys' rows (callers
    at scale partition-prune the view to touched partitions first)."""
    cols = [c for c in view.columns]
    tagged = view.withColumn(sign_col, F.lit(1)).unionByName(delta)
    return (
        tagged.groupBy(*cols)
        .agg(F.sum(sign_col).alias("__net"))
        .where(F.col("__net") > 0)
        .select(*cols)
    )


def signed_agg_refresh(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    sign_col: str = "sign",
) -> DataFrame:
    """Retraction-aware KPI refresh — the aggregate face of the Z-set
    device (signed_join_delta covers joins): the signed event batch
    collapses to ONE partial state per touched group (n = Σ sign,
    total = Σ sign·value, DECIMAL-exact), which merges into the
    materialized view by plain addition; groups whose net count reaches
    zero disappear, so deletes fold through the same path as inserts.
    Refresh cost = one aggregate of the batch + a key-cardinality merge,
    never a rescan of history. Only for decomposable aggregates — count
    and sum retract exactly; min/max do not (a retracted minimum needs
    the full recompute or an ordered-state sketch)."""
    d = delta.groupBy(*keys).agg(
        F.sum(sign_col).cast("bigint").alias("n"),
        F.sum(
            F.col(sign_col) * F.col(value_col).cast("decimal(18,6)")
        ).alias("__tot"),
    )
    v = view.select(
        *keys,
        F.col("n"),
        F.col("total").cast("decimal(18,6)").alias("__tot"),
    )
    return (
        merge_partial_aggregates(
            [v, d],
            keys,
            {"n": F.sum("n"), "__tot": F.sum("__tot")},
        )
        .where(F.col("n") > 0)
        .select(*keys, "n", F.col("__tot").cast("double").alias("total"))
    )


def pit_dimension_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    time_col: str,
    attrs: list[str],
    version_from: str = "valid_from",
    version_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time ("as-was") dimension lookup: each fact row picks the
    SCD2 version whose half-open validity interval [valid_from,
    valid_to) contains the fact's time — the standard warehouse pattern
    for reporting against the attribute values that HELD at transaction
    time rather than today's (is_current would silently rewrite
    history).

    Physically this is NOT an interval inequality join (whose naive plan
    is a per-key cross of facts x versions): version VALIDITY is
    equivalent to a backward as-of join against the version-START rows,
    which asof.asof_join runs as one union + one key-partitioned carry
    window — one shuffle total, no fact x version blowup. Equivalence
    holds because SCD2 intervals chain per key: the latest start <= t is
    exactly the holding interval, and a same-date empty run [d, d)
    loses the tie to the holding run via greatest valid_to (NULL =
    current coalesced to a +infinity sentinel)."""
    from pipeline_pyspark_etl_imdb_spark.operators.asof import asof_join

    sentinel = F.lit("9999-12-31").cast(versions.schema[version_to].dataType)
    vstarts = versions.select(
        key,
        F.col(version_from).alias(time_col),
        F.coalesce(F.col(version_to), sentinel).alias("__vto"),
        *attrs,
    )
    return asof_join(
        facts,
        vstarts,
        on=time_col,
        by=key,
        value_cols=attrs,
        tie_col="__vto",
        right_on_alias="version_from",
    )


def reconciliation_audit(
    orders: DataFrame,
    lineitem: DataFrame,
    tolerance_cents: int = 1,
) -> DataFrame:
    """Header-vs-detail reconciliation — the warehouse-QA gate that the
    order header total equals the recomputed lineitem charge
    sum(extendedprice * (1 - discount) * (1 + tax)), the TPC-H invariant
    and the canonical "does the mart foot to the ledger?" audit.

    All money arithmetic is DECIMAL end-to-end (per-line charge at scale
    6, exact for 2-decimal inputs; order-independent sums), so the diff
    is exact — the only doubles in the output are the reported stats.

    One row: n_orders, n_with_lines (headers having details), n_exact
    (diff == 0), n_within_tol (|diff| <= tolerance_cents/100), n_beyond,
    max_abs_diff, total_abs_diff. Shape: ONE partial-agg groupBy on the
    detail + a broadcast-free sort-free left join on the header key +
    one constant-size fold — each table is read once."""
    charge = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
        * (F.lit(1).cast("decimal(4,2)") + F.col("l_tax").cast("decimal(4,2)"))
    )
    detail = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(charge).alias("__charge")
    )
    tol = F.lit(tolerance_cents).cast("decimal(12,2)") / F.lit(100).cast(
        "decimal(12,2)"
    )
    joined = orders.select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(12,2)").alias("__hdr")
    ).join(detail, "o_orderkey", "left")
    diff = F.col("__hdr") - F.col("__charge")
    adiff = F.abs(diff)
    return joined.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("__charge").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_lines"),
        F.sum(F.when(diff == 0, 1).otherwise(0)).cast("bigint").alias("n_exact"),
        F.sum(F.when((adiff > 0) & (adiff <= tol), 1).otherwise(0))
        .cast("bigint")
        .alias("n_within_tol"),
        F.sum(F.when(adiff > tol, 1).otherwise(0))
        .cast("bigint")
        .alias("n_beyond_tol"),
        F.max(adiff).cast("double").alias("max_abs_diff"),
        F.sum(adiff).cast("double").alias("total_abs_diff"),
    )


def benford_digit_audit(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit distribution of a money column against
    Benford's law — the classic fabricated-data / ETL-corruption screen
    (a currency conversion applied twice, a truncated export, or
    synthetic padding all bend the leading-digit curve).

    The digit is extracted INTEGER-side: cents = round(amount * 100) as
    a bigint, first character of its decimal string — no log10 of a
    double near a power-of-ten boundary, where engines could round
    floor(log10(x)) apart. Rows with amount <= 0 are excluded (Benford
    is defined on positive magnitudes).

    Output: 9 rows (digit, n, obs_share, exp_share, chisq_term) joined
    against a constant 1..9 spine so absent digits report 0 — the
    Pearson term (O - n e)^2 / (n e) sums to the audit chi-square.
    Shape: one map-side digit projection + a 9-group partial agg."""
    spark = df.sparkSession
    cents = F.round(F.col(amount_col) * 100).cast("bigint")
    digits = (
        df.where(F.col(amount_col) > 0)
        .select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    full = (
        spine.join(digits, "digit", "left")
        .select("digit", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"))
        .withColumn("total", F.sum("n").over(wall).cast("double"))
    )
    exp_share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    obs = F.col("n").cast("double")
    return full.select(
        "digit",
        "n",
        (obs / F.col("total")).alias("obs_share"),
        exp_share.alias("exp_share"),
        (
            (obs - F.col("total") * exp_share)
            * (obs - F.col("total") * exp_share)
            / (F.col("total") * exp_share)
        ).alias("chisq_term"),
    ).orderBy("digit")
