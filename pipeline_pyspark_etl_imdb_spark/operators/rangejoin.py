"""Range (interval) join — points against intervals without a cross join.

``range_join(points, intervals, ...)`` matches each point row to every
interval row with ``start <= point <= end`` (within optional equality
keys). Naively this is a theta join that Spark executes as
BroadcastNestedLoopJoin (fine when intervals broadcast) or a cross
product (disastrous at scale).

The scale path bins both sides onto a fixed grid: a point belongs to one
bin; an interval spans ceil(len/bin) bins and is replicated to each. The
join becomes an EQUI-join on (keys..., bin) — shuffled, partitionable,
skew-free for uniformly distributed data — followed by the exact range
predicate. Replication factor = avg interval length / bin width + 1, so
``bin_width`` should be on the order of the typical interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_width: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner join of points to enclosing intervals (inclusive bounds).

    All of ``point_col``/``start_col``/``end_col`` must be numeric (or
    epoch-converted) in the same units as ``bin_width``.
    """
    keys = list(keys)
    p = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width).cast("bigint"))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("bigint"),
                F.floor(F.col(end_col) / bin_width).cast("bigint"),
            )
        ),
    )
    return (
        p.join(i, keys + [_BIN])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop(_BIN)
    )
