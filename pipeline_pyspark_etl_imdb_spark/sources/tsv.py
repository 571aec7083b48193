"""Delimited-text scan with IMDb-style null-marker handling.

Capability parity with ``read_tsv_gz`` + ``replace_null_markers``
(/root/reference/src/etl_imdb.py:121-126): tab separator, header row,
transparent gzip, all-string columns when no schema is given, and
exact-match replacement of a null marker (``\\N``) with SQL NULL.

Scale notes: gzip is a non-splittable codec, so one .gz file = one task
regardless of cluster size. The scan itself can't fix that, but
``read_tsv(..., repartition_to=N)`` lets callers fan the parsed rows out
immediately after the single-threaded decompress, which is the right
pattern when one big .gz feeds a wide pipeline. For a schema'd read we
hand Spark the explicit schema so the (expensive, full-pass) inference
never runs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

NULL_MARKER = "\\N"


def read_tsv(
    spark: SparkSession,
    path: str,
    *,
    sep: str = "\t",
    header: bool = True,
    schema: str | None = None,
    repartition_to: int | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a (possibly gzipped) delimited file.

    Without ``schema``, matches the reference contract exactly: column names
    from the header, every column StringType, no inference pass.

    Malformed-row policy (only meaningful with an explicit ``schema``):
    PERMISSIVE (default) nulls out bad fields, DROPMALFORMED discards the
    row, FAILFAST raises. Pass ``corrupt_col`` to quarantine raw malformed
    lines into a named column instead of losing them — at 100 TB you audit
    the quarantine, you don't crash the run.

    NOTE: Spark refuses queries that reference only the corrupt column of
    a CSV scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    ``.cache()`` the parsed frame before filtering on ``corrupt_col``, as
    Spark's own error message instructs.
    """
    if corrupt_col is not None and mode != "PERMISSIVE":
        # Spark populates columnNameOfCorruptRecord ONLY in PERMISSIVE
        # mode; in DROPMALFORMED the quarantine would read as empty while
        # rows are silently dropped — the opposite of its purpose
        raise ValueError(f"corrupt_col requires mode='PERMISSIVE', got {mode!r}")
    if corrupt_col is not None and schema is None:
        # without an explicit schema the corrupt field can't be added to
        # it and Spark silently ignores the option — fail loudly instead
        raise ValueError("corrupt_col requires an explicit schema")
    reader = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", mode)
    )
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        if schema is not None:
            schema = f"{schema}, {corrupt_col} string"
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if repartition_to:
        df = df.repartition(repartition_to)
    return df


def replace_null_markers(
    df: DataFrame, columns: Iterable[str], marker: str = NULL_MARKER
) -> DataFrame:
    """Exact-match replace ``marker`` -> NULL on a column subset.

    Same semantics as DataFrame.replace({"\\N": None}) in the reference
    (/root/reference/src/etl_imdb.py:125-126): only full-cell matches are
    replaced, other values pass through untouched.
    """
    return df.replace({marker: None}, subset=list(columns))
