"""Column-level cleaning / normalization expressions.

All of these are thin compositions of built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd) — no Python UDFs. They cover the
scalar-expression surface in SURVEY.md §2.2/§2.7:

- conditional NULL-out of a sentinel value (reference
  /root/reference/src/etl_imdb.py:172, the F.when form)
- string->numeric casts with null-on-error (reference :135-137, 146-147;
  we use try_cast so the semantics hold even under ANSI mode)
- trim+lower token normalization (reference :176)
- half-point bucketing floor(x*2)/2.0 (reference :231) plus a general
  fixed-width bucketizer
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_if_equal(col: Column | str, sentinel: str) -> Column:
    """CASE WHEN col == sentinel THEN NULL ELSE col END."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == sentinel, F.lit(None)).otherwise(c)


def to_int(col: Column | str) -> Column:
    """Cast to int; non-numeric input becomes NULL (never an error)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def to_double(col: Column | str) -> Column:
    """Cast to double; non-numeric input becomes NULL (never an error)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def norm_token(col: Column | str) -> Column:
    """trim(lower(col)) — canonical form for multi-value string members."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.lower(c))


def half_point_bucket(col: Column | str) -> Column:
    """floor(x * 2) / 2.0 — 0.5-wide buckets; NULL in -> NULL bucket."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 2) / 2.0


def width_bucket(col: Column | str, width: float) -> Column:
    """floor(x / width) * width — generic fixed-width histogram bucket."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / width) * width
