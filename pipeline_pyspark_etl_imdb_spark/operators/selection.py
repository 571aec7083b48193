"""Distributed EXACT order statistics by iterative histogram narrowing —
the seventh iterative-algorithm shape: driver-held integer BOUNDS.

Spark's exact ``percentile()`` aggregate buffers every value of a group
in executor memory (OpenHashMap of counts) — fine for the fixture-sized
groups the registry's percentile queries aggregate, a scale bug for an
exact global median over 10^11 rows. approx_percentile bounds memory but
surrenders exactness. The classic third way (distributed selection /
"median of a billion numbers"): narrow an integer value range around the
k-th order statistic with a 256-ary histogram per round —

    round := one partially-aggregated conditional groupBy producing
             <= 256 (bucket, count) rows; the driver walks the prefix
             sums, picks the bucket containing rank k, rescales k to the
             bucket, and recurses into its sub-range.

O(log_256 range) rounds (3 for cent-priced values up to ~$10^6), each a
full scan with the BETWEEN range pushed down to the parquet reader (so
later rounds touch only row groups whose min/max straddle the narrowed
range — the scan itself shrinks as the range does). Driver state is two
integers; nothing value-sized ever concentrates on one node, unlike a
global sort (Exchange of the corpus) or percentile() (per-group value
buffer).

Works on any integer-mappable domain; lineitem prices are DECIMAL(12,2),
so cents are BIGINT-exact and the whole walk is integer-deterministic —
the registry query hash-matches the oracle's ORDER BY/OFFSET definition
bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 256


def exact_kth(values: DataFrame, k: int, col: str = "c") -> int:
    """The k-th smallest (1-based) of an integer column, by histogram
    narrowing. Caller guarantees 1 <= k <= count."""
    row = values.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = int(row["lo"]), int(row["hi"])
    while lo < hi:
        width = max(1, (hi - lo + N_BUCKETS) // N_BUCKETS)
        hist = (
            values.where(F.col(col).between(F.lit(lo), F.lit(hi)))
            .groupBy(((F.col(col) - F.lit(lo)) / F.lit(width)).cast("bigint").alias("b"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
        cum = 0
        for b, n in sorted((int(r["b"]), int(r["n"])) for r in hist):
            if cum + n >= k:
                lo2 = lo + b * width
                hi2 = min(hi, lo2 + width - 1)
                k -= cum
                lo, hi = lo2, hi2
                break
            cum += n
        else:  # pragma: no cover — unreachable when k <= count
            raise ValueError("rank exceeds row count in range")
        if width == 1:
            return lo
    return lo


def exact_median_report(
    df: DataFrame,
    value_col: str,
    cents: bool = True,
) -> DataFrame:
    """One-row report: (n_rows, median) with the standard even-count
    interpolation (mean of the two middle values). ``cents=True`` maps a
    DECIMAL(_,2) column to BIGINT cents so every comparison in the
    narrowing walk is integer-exact (the oracle replicates the same
    ORDER BY/OFFSET definition).

    Cost: min/max + ceil(log_256 range) histogram rounds + (even counts
    only) one adjacency probe — every job returns <= 256 rows to the
    driver."""
    spark = df.sparkSession
    scale = 100 if cents else 1
    vals = df.select(
        (F.col(value_col) * scale).cast("bigint").alias("c")
    ).where(F.col("c").isNotNull())
    n = vals.count()
    if n == 0:
        return spark.createDataFrame([], "n_rows bigint, median double")
    k_lo = (n + 1) // 2
    a = exact_kth(vals, k_lo)
    if n % 2 == 1:
        med = float(a) / scale
    else:
        # the (k_lo+1)-th value: a itself if duplicates span the middle,
        # else the smallest value strictly above a (one extra aggregate)
        n_le_a = vals.where(F.col("c") <= a).count()
        if n_le_a >= k_lo + 1:
            b = a
        else:
            b = int(
                vals.where(F.col("c") > a).agg(F.min("c").alias("m")).collect()[0]["m"]
            )
        med = (a + b) / (2.0 * scale)
    return spark.createDataFrame(
        [(n, med)], "n_rows bigint, median double"
    )
