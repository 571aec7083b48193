"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)`` attaches to each left row the most
recent right row with ``right.on <= left.on`` within the same ``by``
group. The classic use: enrich trades with the prevailing quote, or an
event with the latest preceding state snapshot.

Spark-first implementation (composition of built-ins, no UDF): union the
two sides tagged by origin, sort within each ``by`` partition by
(on, side), and carry the latest right-side values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window — the
distributed merge-join formulation. ONE shuffle (on ``by``), no range
explosion, no per-row lookups; at 100 TB this scales exactly like any
windowed aggregation and skew follows the ``by`` key distribution.

Ties (right.on == left.on): the right row sorts before the left row
(side 0 < side 1), so an exactly-simultaneous right row IS visible to the
left row — standard backward as-of semantics (pandas merge_asof,
DuckDB ASOF JOIN).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_ORDER_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
    *,
    tolerance: int | None = None,
    right_on_alias: str = "matched_on",
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
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {on, *by_cols}]

    l_tagged = left.select(
        *by_cols,
        F.col(on),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in {on, *by_cols}],
    )
    r_tagged = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(on).alias("__r_on"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
            if c not in {on, *by_cols}
        ],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
        F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
    )

    out = carried.where(F.col(_SIDE) == 1)
    if tolerance is not None:
        in_range = (F.col(on) - F.col("__m_on")) <= tolerance
        out = out.select(
            *[c for c in out.columns if not c.startswith("__m_")],
            *[
                F.when(in_range, F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in value_cols
            ],
            F.when(in_range, F.col("__m_on")).alias("__m_on_t"),
        ).withColumnRenamed("__m_on_t", "__m_on")

    return out.select(
        *by_cols,
        F.col(on),
        *[
            F.col(f"__l_{c}").alias(c)
            for c in left.columns
            if c not in {on, *by_cols}
        ],
        *[F.col(f"__m_{c}").alias(c) for c in value_cols],
        F.col("__m_on").alias(right_on_alias),
    )
