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
) -> DataFrame:
    """Read a (possibly gzipped) delimited file.

    Without ``schema``, matches the reference contract exactly: column names
    from the header, every column StringType, no inference pass.
    """
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
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
