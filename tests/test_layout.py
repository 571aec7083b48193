"""Z-order layout must deliver what it promises: after clustering, a
point predicate on EITHER interleaved column overlaps far fewer files'
[min, max] ranges than a single-column-sorted layout — the measurable
data-skipping effect, quantified through the file-stats manifest."""

from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.sources.layout import (
    file_stats_manifest,
    zorder_layout,
    zorder_value,
)

N_FILES = 16


def test_zorder_value_interleaves_bits(spark):
    # (x=0b11, y=0b01) with 2 bits -> z = x bits at positions 0,2; y at 1,3
    row = (
        spark.range(1)
        .select(
            zorder_value([F.lit(3), F.lit(1)], bits=2).alias("z"),
            zorder_value([F.lit(0), F.lit(0)], bits=2).alias("zero"),
        )
        .collect()[0]
    )
    assert row.z == 0b0111  # x0=1->bit0, y0=1->bit1, x1=1->bit2, y1=0->bit3
    assert row.zero == 0


def test_zorder_is_deterministic_and_total(spark):
    df = spark.range(1000).select(
        (F.col("id") % 32).alias("x"), F.floor(F.col("id") / 32).alias("y")
    )
    a = [r.z for r in df.select(zorder_value(["x", "y"], 8).alias("z")).collect()]
    b = [r.z for r in df.select(zorder_value(["x", "y"], 8).alias("z")).collect()]
    assert a == b
    assert len(set(a)) == 1000  # distinct (x, y) -> distinct z


def _overlap_fraction(manifest_pdf, col, point):
    rows = manifest_pdf[manifest_pdf.col_name == col]
    hits = sum(
        1
        for r in rows.itertuples()
        if int(r.min_value) <= point <= int(r.max_value)
    )
    return hits / len(rows)


def test_zorder_layout_narrows_file_ranges_on_both_columns(spark, tmp_path):
    # two independent uniform dimensions; natural layout sorts by x only,
    # so y's per-file range spans everything and a y-predicate skips nothing
    df = spark.range(40_000).select(
        ((F.col("id") * 2654435761) % 1024).alias("x"),
        ((F.col("id") * 40503) % 1024).alias("y"),
    )
    flat, zed = str(tmp_path / "flat"), str(tmp_path / "zed")
    df.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.parquet(flat)
    zorder_layout(df, ["x", "y"], bits=10, n_files=N_FILES).write.parquet(zed)

    flat_m = file_stats_manifest(spark, flat, ["x", "y"]).toPandas()
    zed_m = file_stats_manifest(spark, zed, ["x", "y"]).toPandas()
    assert len(zed_m) == 2 * N_FILES  # one stats row per (file, column)

    # x-sorted layout: perfect on x, useless on y
    assert _overlap_fraction(flat_m, "x", 512) <= 2 / N_FILES
    assert _overlap_fraction(flat_m, "y", 512) == 1.0
    # z-ordered layout: a point predicate on EITHER column skips most files
    assert _overlap_fraction(zed_m, "x", 512) <= 0.5
    assert _overlap_fraction(zed_m, "y", 512) <= 0.5


def test_read_with_skipping_prunes_and_matches_full_scan(spark, tmp_path):
    from pipeline_pyspark_etl_imdb_spark.sources.layout import (
        prune_files_by_stats,
        read_with_skipping,
    )

    df = spark.range(40_000).select(
        ((F.col("id") * 2654435761) % 1024).alias("x"),
        ((F.col("id") * 40503) % 1024).alias("y"),
    )
    zed = str(tmp_path / "zed_read")
    zorder_layout(df, ["x", "y"], bits=10, n_files=N_FILES).write.parquet(zed)
    manifest = file_stats_manifest(spark, zed, ["x", "y"]).persist()

    lo, hi = 100, 140
    kept = prune_files_by_stats(manifest, "y", lo, hi)
    assert 0 < len(kept) < N_FILES  # pruning actually skipped files

    got = read_with_skipping(spark, manifest, "y", lo, hi)
    want = spark.read.parquet(zed).where((F.col("y") >= lo) & (F.col("y") <= hi))
    assert got.count() == want.count()
    g = sorted((r.x, r.y) for r in got.collect())
    w = sorted((r.x, r.y) for r in want.collect())
    assert g == w
    manifest.unpersist()
