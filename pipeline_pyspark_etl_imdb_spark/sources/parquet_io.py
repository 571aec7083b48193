"""Parquet scan & sink.

Sink parity with ``write_parquet`` (/root/reference/src/etl_imdb.py:238-242):
overwrite mode with optional hive-style partitioning; the session pins
``partitionOverwriteMode=dynamic`` so partitioned overwrites only replace
touched partitions (reference: src/etl_imdb.py:85).

Scale: partitioned writes give downstream readers partition pruning; the
optional ``max_records_per_file`` keeps individual files bounded at 100 TB
so a single hot partition can't produce a multi-GB file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    sep: str = "\t",
    header: bool = True,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Delimited-text export — the interchange sink mirroring the TSV
    source (external consumers, reference README's QA path)."""
    writer = df.write.mode(mode).option("sep", sep).option("header", str(header).lower())
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines export for schema-fluid consumers."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema (never inference — a
    100 TB inference pass reads the data twice and freezes whatever the
    first sample implies) in PERMISSIVE mode: malformed lines land whole
    in ``corrupt_col`` instead of failing the job, mirroring the TSV
    source's null-marker tolerance. Filter/route on the corrupt column
    downstream (dead-letter pattern)."""
    full_schema = f"{schema}, {corrupt_col} STRING"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a directory of small parquet files into ~target-size files.

    The long-running-pipeline housekeeping op: streaming sinks and
    fine-grained partition writes accumulate kilobyte files whose
    per-file open/footer cost dominates scans at scale. Sizing uses the
    actual on-disk bytes (not row counts), and the rewrite is a single
    narrow repartition job. Returns the number of output files chosen.
    """
    df = spark.read.parquet(src_path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, int(total / target_file_bytes) + (1 if total % target_file_bytes else 0))
    df.repartition(n_files).write.mode("overwrite").parquet(dest_path)
    return n_files


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    *,
    mode: str = "overwrite",
) -> None:
    """ORC sink — the columnar interchange format for Hive/Trino-side
    consumers; same overwrite + hive-partitioning contract as the
    parquet sink (both formats share Spark's vectorized reader and
    predicate-pushdown path, so the scan-side plan properties the
    plan-quality suite asserts hold for either)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.orc(path)


def read_xml(
    spark: SparkSession, path: str, *, row_tag: str = "row", schema: str | None = None
) -> DataFrame:
    """XML source (native in Spark 4 — the StaxXML reader): one row per
    ``row_tag`` element. Pass an explicit DDL ``schema`` in production —
    schema inference is a full extra pass over the data, exactly like
    JSON/CSV inference (see read_jsonl's schema-pinning rationale)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, *, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink — for feed-style consumers that require markup. Row-group
    columnar properties don't apply (XML is a row format with no stats or
    pushdown); use it at the EDGE of the pipeline, never as an
    intermediate format."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
