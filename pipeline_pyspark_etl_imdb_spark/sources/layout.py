"""Data-layout operators: Z-order clustering and file-level skipping
stats — the storage-side half of scan performance.

Partition pruning (tested in test_plan_quality) skips whole hive
partitions, but a 100 TB table can only partition on ONE low-cardinality
key. Z-ordering solves multi-column locality: interleaving the bits of
k columns into one sort key places rows close in any of the k dimensions
into the same files, so per-file min/max ranges stay narrow on EVERY
interleaved column and a point/range predicate on any of them skips most
files (parquet row-group stats do the same inside a file). This is the
lakehouse OPTIMIZE ZORDER BY pattern, built from pure column arithmetic:

- ``zorder_value``   — bit-interleaved sort key (built-in bitwise ops,
  codegen'd; no UDF);
- ``zorder_layout``  — range-repartition + in-partition sort by that key
  (one range shuffle — the same cost as any sorted write);
- ``file_stats_manifest`` — per-file (min, max, count) stats per column,
  the Iceberg/Delta-style manifest a planner consults to skip files.

tests/test_layout.py quantifies the effect: after z-order layout, the
fraction of files whose [min, max] straddles a point predicate drops on
both interleaved columns vs the natural (single-column-sorted) layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column, column j owning bit positions j, j+k, j+2k, ... The inputs
    must already be non-negative ints that fit ``bits`` bits (rank- or
    range-normalize upstream); values are masked to ``bits`` bits so
    out-of-range inputs degrade gracefully instead of colliding the
    high bits. Pure built-in bitwise arithmetic — engine-portable and
    whole-stage-codegen'd."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    mask = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cs):
        masked = c.bitwiseAND(F.lit(mask))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(masked, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, n_files: int | None = None
) -> DataFrame:
    """Cluster ``df`` for a z-ordered write: range-repartition on the
    interleaved key (contiguous z-ranges per output file) and sort within
    partitions so parquet row-group stats are tight too. Write the result
    with ``write_parquet``; one range shuffle total."""
    z = zorder_value(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    part = (
        out.repartitionByRange(n_files, "__z")
        if n_files
        else out.repartitionByRange("__z")
    )
    return part.sortWithinPartitions("__z").drop("__z")


def file_stats_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file skipping stats for a parquet directory: one row per
    (file, column) with min/max/null-count/row-count — the manifest that
    decides "can this file possibly contain rows matching the predicate".
    One scan, one aggregation keyed by file; the manifest is file-count
    sized, so it broadcasts for planning-time use."""
    df = spark.read.parquet(path)
    aggs: list[Column] = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
        ]
    wide = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
                F.col(f"__null_{c}").alias("n_null"),
            )
            for c in cols
        ]
    )
    return wide.select("file", F.explode(rows).alias("s")).select("file", "s.*")


def prune_files_by_stats(
    manifest: DataFrame, col_name: str, lo: float, hi: float
) -> list[str]:
    """File paths whose [min, max] range for ``col_name`` intersects
    [lo, hi] — the planning-time skip decision over a (file-count-sized)
    manifest. Numeric comparison on the stringified stats; a file is kept
    when it COULD contain a matching row (min <= hi and max >= lo), so
    pruning is always sound, never lossy."""
    rows = (
        manifest.where(F.col("col_name") == col_name)
        .where(
            (F.col("min_value").cast("double") <= hi)
            & (F.col("max_value").cast("double") >= lo)
        )
        .select("file")
        .collect()
    )
    return [r.file for r in rows]


def read_with_skipping(
    spark: SparkSession,
    manifest: DataFrame,
    col_name: str,
    lo: float,
    hi: float,
) -> DataFrame:
    """Scan only the files the manifest can't rule out for the range
    predicate, then re-apply the predicate exactly. With a z-ordered
    layout the kept file set is a small fraction of the table on ANY of
    the interleaved columns — this is the read-path half of the
    OPTIMIZE ZORDER pattern (the write-path half is zorder_layout).

    The collect here is file-count-sized planning metadata (same class of
    driver work as listing a directory), not data.

    When NO file survives pruning the predicate provably selects nothing;
    that is a valid (empty) answer, so the scan short-circuits to an
    empty DataFrame with the table's schema — derived by scanning one
    manifest file's footer with a WHERE false that never reads row data —
    instead of raising (every other operator returns empty frames for
    empty selections)."""
    files = prune_files_by_stats(manifest, col_name, lo, hi)
    if not files:
        any_file = manifest.select("file").limit(1).collect()
        if not any_file:
            raise ValueError("empty manifest: no files to derive a schema from")
        return spark.read.parquet(any_file[0].file).where(F.lit(False))
    return spark.read.parquet(*files).where(
        (F.col(col_name) >= lo) & (F.col(col_name) <= hi)
    )
