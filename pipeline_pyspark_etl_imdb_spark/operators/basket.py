"""Market-basket association rules over the order/part bipartite table:
support, confidence, and lift for co-purchased item pairs — the
frequent-itemset primitive (Agrawal & Srikant 1994, A-priori's k=2
stage, which in practice carries most of the value of the full lattice).
Extends the reference's join+aggregate family (SURVEY.md §2 J1/A1;
reference parity src/etl_imdb.py:243-260) with a self-join mining shape.

All scores are ratios of exact integer counts (one double division
each), so the whole result is bit-identical cross-engine and
oracle-backed.

Physical shape (survives 100 TB):
- baskets dedup map-side (order, item) first — the ONLY corpus-sized
  aggregation;
- pair counts ride the per-basket self-join: fan-out is deg(basket)^2,
  bounded by basket size, never all-pairs across the catalog (the same
  blocking argument as the co-purchase graph and LSH banding; a basket
  size cap is the skew lever for pathological carts);
- item counts and the basket total are two SMALL side aggregates,
  broadcast back onto the pair table;
- min_support prunes BEFORE the scoring joins, and the final top-n
  compiles to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    top_n: int = 100,
    max_basket: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_ab, n_a, n_b, support, confidence, lift) for
    item_a < item_b, the ``top_n`` pairs by lift (ties: n_ab desc, then
    ids). confidence is P(b|a) for the a->b direction; lift is
    symmetric."""
    from pipeline_pyspark_etl_imdb_spark.operators.util import tracked_persist

    baskets = lineitem.select(
        F.col(order_col).alias("o"), F.col(item_col).alias("i")
    ).dropDuplicates(["o", "i"])
    if max_basket is not None:
        sized = baskets.groupBy("o").agg(F.count("*").alias("__sz"))
        keep = sized.where(F.col("__sz") <= max_basket).select("o")
        baskets = baskets.join(keep, "o")
    # four consumers (basket count, item counts, both pair-join sides)
    # read one cached evaluation; long-session callers release via
    # operators.util.release_tracked()
    baskets = tracked_persist(baskets)
    n_baskets = baskets.select("o").distinct().count()
    item_counts = baskets.groupBy(F.col("i")).agg(F.count("*").alias("n_item"))
    a = baskets.select("o", F.col("i").alias("item_a"))
    b = baskets.select("o", F.col("i").alias("item_b"))
    pairs = (
        a.join(b, "o")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    # the item-count frame is catalog-sized, not fact-sized — usually a
    # broadcastable dimension, but size-guarded like every other forced
    # broadcast in the repo (falls back to shuffle equi-joins on a
    # 10^8-item catalog)
    small_catalog = item_counts.count() <= 5_000_000
    ca = item_counts.select(
        F.col("i").alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = item_counts.select(
        F.col("i").alias("item_b"), F.col("n_item").alias("n_b")
    )
    if small_catalog:
        ca, cb = F.broadcast(ca), F.broadcast(cb)
    nb = float(n_baskets)
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.lit(nb)).alias("support"),
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
            (
                F.lit(nb) * F.col("n_ab") / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(
            F.desc("lift"), F.desc("n_ab"), F.asc("item_a"), F.asc("item_b")
        )
        .limit(top_n)
    )
