"""k-core decomposition — the degeneracy peel over a pair list.

The k-core of a graph is the maximal subgraph in which every node has
degree >= k (Seidman 1983); it is the standard structural filter for
"dense enough to matter" — spam farms, co-purchase cliques, boilerplate
hubs — and the complement of the degree-cap trick used elsewhere in this
repo (triangles.cooccurrence_edges drops hot nodes; k_core KEEPS only the
mutually-dense region).

Algorithm: iterative peel. Each round computes degrees with ONE
partially-aggregated groupBy over the (symmetrized, persisted) edge list
and drops nodes below k; peeling one node can drag neighbors below k, so
the loop repeats to fixpoint — O(peel depth) rounds, each one shuffle of
(node, degree) pairs (8-16 bytes per live node, never edge payloads).
Same driver-controlled loop contract as components.connected_components:
persist the live-node frontier, localCheckpoint to truncate lineage,
hard iteration cap as a guardrail.

Not SQL-oracle-expressible (recursive CTEs cannot aggregate in the
recursive term), so the registry query is rows-only; tests pin the
operator against a pure-Python peel on the same fixture graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """(node, degree) for every node of the k-core, ordered degree DESC
    then node ASC; degree is the node's degree WITHIN the core. Empty
    result when no k-core exists. Raises if not converged in ``max_iter``
    rounds (each round removes at least one node, so max_iter bounds the
    peel depth, not the node count)."""
    # one-pass symmetrize (same single-evaluation idiom as
    # connected_components: the edge list is usually an expensive
    # candidate-pair subtree — emit both orientations from one pass)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src_col).alias("a"), F.col(dst_col).alias("b")),
                    F.struct(F.col(dst_col).alias("a"), F.col(src_col).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .repartition(F.col("a"))
        .persist()
    )
    live = sym
    prev_n: int | None = None
    try:
        for _ in range(max_iter):
            deg = live.groupBy(F.col("a").alias("node")).agg(
                F.count("*").alias("degree")
            )
            keep = deg.where(F.col("degree") >= k).select("node")
            n_after = keep.count()
            if n_after == 0:
                return (
                    deg.where(F.lit(False))
                    .select("node", "degree")
                    .orderBy(F.desc("degree"), F.asc("node"))
                )
            # survivor sets are nested round-over-round (peeling only
            # shrinks), so an unchanged count IS set equality — one count
            # job per round, no distinct() over the edge list
            if prev_n is not None and n_after == prev_n:
                return deg.where(F.col("degree") >= k).orderBy(
                    F.desc("degree"), F.asc("node")
                )
            prev_n = n_after
            # drop edges touching peeled nodes: two semi-joins against the
            # (small) survivor list — broadcast when the optimizer sizes it
            # under the threshold, never a shuffle of edge payloads
            pruned = (
                live.join(keep, live.a == keep.node, "left_semi")
                .join(keep.select(F.col("node").alias("node2")),
                      F.col("b") == F.col("node2"), "left_semi")
                .localCheckpoint(eager=True)
            )
            live = pruned
        raise RuntimeError(f"k_core: no fixpoint in {max_iter} iterations")
    finally:
        sym.unpersist()
