"""Local replica of the driver's DuckDB-oracle comparison.

Protocol (FIXTURES.md 'Comparison protocol'): run the Spark query and the
oracle SQL on the same parquet tables, sort columns by name, sort rows by
all columns, round doubles to 6 decimal places, then compare values
exactly. Row-count and column-name-set mismatches are reported first for
diagnosability.
"""

from __future__ import annotations

import math
from datetime import date, datetime, time

import duckdb
import pandas as pd

from pipeline_pyspark_etl_imdb_spark.sources.tables import FIXTURE_TABLES

ROUND_DECIMALS = 6


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in FIXTURE_TABLES:
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return conn


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, ROUND_DECIMALS)
    if isinstance(v, datetime):
        # pandas NaT IS a datetime instance but .time() raises on it; it
        # is the null timestamp, so canonicalize like None (found by the
        # r8 NULL-parity scan: signed_daily_kpi_refresh's NULL o_orderdate)
        if v != v:
            return None
        # a DATE round-trips as midnight datetime through pandas; collapse
        # so date-typed and timestamp-typed calendars compare equal
        if v.time() == time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:  # numpy array
        return tuple(_canon_value(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), ROUND_DECIMALS)
    except ImportError:  # pragma: no cover
        pass
    return v


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def _value_class(v) -> str | None:
    """Numeric class AFTER canonicalization. The driver hashes stringified
    values, so an integer-valued column that reaches pandas as float64 (e.g.
    an uncast DuckDB HUGEIN T sum) hashes "5.0" against Spark's "5" and goes
    red even though the values are numerically equal — the exact failure
    mode of r3's k_anonymity_customers. Python's 5 == 5.0 hides it from a
    pure value compare, so classes are checked separately."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return None  # strings/dates/tuples: a class clash fails the value compare


def _column_classes(rows: list[tuple], ncols: int) -> list[set[str]]:
    classes: list[set[str]] = [set() for _ in range(ncols)]
    for row in rows:
        for i, v in enumerate(row):
            c = _value_class(v)
            if c is not None:
                classes[i].add(c)
    return classes


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    cols = sorted(spark_pdf.columns)
    s_cls = _column_classes(s_rows, len(cols))
    o_cls = _column_classes(o_rows, len(cols))
    for col, sc, oc in zip(cols, s_cls, o_cls):
        if sc and oc and sc != oc:
            problems.append(
                f"numeric-class mismatch on {col!r}: spark={sorted(sc)} "
                f"oracle={sorted(oc)} (driver hashes '5' vs '5.0' as different)"
            )
    if s_rows != o_rows:
        diffs = [
            f"  row {i}: spark={s} oracle={o}"
            for i, (s, o) in enumerate(zip(s_rows, o_rows))
            if s != o
        ]
        problems.append(
            f"value mismatch ({len(diffs)} differing rows of {len(s_rows)}):\n"
            + "\n".join(diffs[:10])
        )
    return problems
