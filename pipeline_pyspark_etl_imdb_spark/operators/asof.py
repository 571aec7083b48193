"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)`` attaches to each left row the most
recent right row with ``right.on <= left.on`` within the same ``by``
group. The classic use: enrich trades with the prevailing quote, or an
event with the latest preceding state snapshot.

Spark-first implementation (composition of built-ins, no UDF): union the
two sides tagged by origin, sort within each ``by`` partition by
(on, side), and carry the latest right row forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window — the
distributed merge-join formulation. ONE shuffle (on ``by``), no range
explosion, no per-row lookups; at 100 TB this scales exactly like any
windowed aggregation and skew follows the ``by`` key distribution.

Correctness details:
- The matched right row travels as ONE struct, so its fields are
  attached atomically — a NULL field inside the matched row stays NULL
  instead of backfilling from an older row, and the tolerance cutoff
  applies to the whole row.
- Ties (right.on == left.on): the right row sorts before the left row
  (side 0 < side 1), so an exactly-simultaneous right row IS visible to
  the left row — standard backward as-of semantics (pandas merge_asof,
  DuckDB ASOF JOIN).
- Multiple right rows with equal (by, on): pass ``tie_col`` to pick the
  survivor deterministically (greatest tie_col wins); without it the
  survivor among exact right-side duplicates is arbitrary, as in
  DataFrame.dropDuplicates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_ROW = "__asof_row"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
    *,
    tolerance: int | None = None,
    right_on_alias: str = "matched_on",
    tie_col: str | None = None,
) -> DataFrame:
    """Backward as-of join.

    Parameters
    ----------
    on: ordering column, present in both sides (numeric or timestamp;
        tolerance requires a numeric/epoch column).
    by: equality key(s) — the partition within which time ordering holds.
    value_cols: right-side columns to attach (default: all except on/by).
    tolerance: max allowed left.on - right.on (same units as ``on``);
        matches further back are nulled out.
    right_on_alias: output column holding the matched right row's ``on``.
    tie_col: right-side column breaking ties among right rows with equal
        (by, on) — the row with the greatest tie_col value wins.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {on, *by_cols}]

    # the matched right row as a single atomic struct (fields never mix
    # across rows, even when some are NULL)
    row_struct = F.struct(
        F.col(on).alias("__on"), *[F.col(c).alias(c) for c in value_cols]
    )
    null_struct = F.lit(None).cast(
        right.select(row_struct.alias("s")).schema["s"].dataType
    )

    tie_order = []
    if tie_col is not None:
        tie_type = right.schema[tie_col].dataType
        tie_order = [F.col("__tie").asc_nulls_first()]

    l_tagged = left.select(
        *by_cols,
        F.col(on),
        F.lit(1).alias(_SIDE),
        null_struct.alias(_ROW),
        *([F.lit(None).cast(tie_type).alias("__tie")] if tie_col else []),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in {on, *by_cols}],
    )
    r_tagged = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias(_SIDE),
        row_struct.alias(_ROW),
        *([F.col(tie_col).alias("__tie")] if tie_col else []),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
            if c not in {on, *by_cols}
        ],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc(), *tie_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        F.last(_ROW, ignorenulls=True).over(w).alias(_MATCH),
    )

    out = carried.where(F.col(_SIDE) == 1)
    match = F.col(_MATCH)
    if tolerance is not None:
        match = F.when((F.col(on) - F.col(f"{_MATCH}.__on")) <= tolerance, match)

    return out.select(
        *by_cols,
        F.col(on),
        *[
            F.col(f"__l_{c}").alias(c)
            for c in left.columns
            if c not in {on, *by_cols}
        ],
        *[match.getField(c).alias(c) for c in value_cols],
        match.getField("__on").alias(right_on_alias),
    )
