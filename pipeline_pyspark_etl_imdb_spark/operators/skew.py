"""Skew mitigation: salted aggregation and salted join.

At 100 TB a handful of hot keys (one viral document, one null-heavy join
column) can pin an entire stage on one reducer. Two standard remedies,
expressed as plain DataFrame rewrites so Catalyst still sees everything:

- ``salted_agg``: two-phase aggregation. Phase 1 groups on
  (key, salt) — the hot key's rows spread over ``n_salts`` reducers —
  phase 2 merges the partials per key. Correct for any algebraic
  aggregate expressed as (partial, merge) pairs; this helper covers the
  count/sum family, which map-side partial aggregation already helps but
  cannot fully fix when ONE key dominates a partition.

- ``salted_join``: replicate the small side ``n_salts`` times (one copy
  per salt value), salt the big side randomly-but-deterministically
  (hash of a unique column mod n), join on (key, salt). The hot key's
  rows land on n different reducers instead of one. Use when the small
  side is too big to broadcast outright but replication x n is still
  cheap; if the small side fits in memory, ``F.broadcast`` beats this.

AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers sort-merge
joins automatically; these helpers are for aggregations (which AQE does
not re-salt) and for forcing a known-good layout without relying on
runtime stats.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _deterministic_salt(cols: Sequence[str] | None, n_salts: int) -> Column:
    """Salt derived by hashing row content — deterministic (replayable
    tasks get the same salt; F.rand would not guarantee that) and uniform.

    When no distinguishing columns are given, the row's position
    (monotonically_increasing_id: partition id + offset, stable on task
    retry) joins the hash — byte-identical duplicates of a hot key are
    the COMMON skew case, and content-only hashing would send them all to
    one salt, silently defeating the mitigation.
    """
    inputs = [F.col(c) for c in cols] if cols else [F.monotonically_increasing_id()]
    return F.pmod(F.hash(*inputs), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    n_salts: int = 16,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (phase1 partial over raw rows,
    phase2 merge over partials). Example::

        salted_agg(df, ["k"], {
            "n":   (F.count("*"),    F.sum("n")),
            "tot": (F.sum("x"),      F.sum("tot")),
        })

    Phase-1 expressions see the raw columns; phase-2 expressions see the
    phase-1 outputs by their output name.
    """
    salted = df.withColumn(_SALT, _deterministic_salt(salt_from, n_salts))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Output equals ``big.join(small, on, how)`` for 'inner' and 'left'.
    The replicated small side grows by x n_salts — keep n_salts modest.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn(_SALT, _deterministic_salt(salt_from, n_salts))
    small_r = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_r, [on, _SALT], how).drop(_SALT)
