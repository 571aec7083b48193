"""Connected components over a pair list — dedup cluster resolution.

Near-dup detection produces PAIRS (neardup.py, similarity.py); a dedup
pipeline must then resolve clusters (a~b, b~c => {a,b,c}) and keep one
canonical document per cluster. This is iterative min-label propagation,
expressed in DataFrame ops:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each iteration is one shuffle (join on the edge
list + groupBy); convergence needs O(cluster diameter) rounds — near-dup
clusters are shallow (stars around a template), so 3-5 rounds typical.
The loop is driver-controlled with an explicit convergence count per
round — the standard Spark iterative-algorithm shape (persist the
frontier, unpersist the previous round, hard iteration cap as a
guardrail).

At 100 TB the edge list is the LSH candidate output (already pruned);
label propagation shuffles only (node, label) pairs, so each round moves
8-16 bytes per node, not document content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.util import (
    defer_checkpoint_release,
    iterative_loop_conf,
    record_prechk,
    release_local_checkpoint,
)


def connected_components(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; the component id is
    the minimum node id in the component. Raises if not converged within
    ``max_iter`` (pathologically deep graphs need large-star/small-star)."""
    # symmetrize with ONE evaluation of the edge subtree: the edge list is
    # usually an expensive candidate-pair computation (LSH/shingle self-
    # join), and union(edges, edges.swapped) would execute that subtree
    # twice — explode emits both orientations from a single pass
    # REVERTED r10 experiment (kept for the record, see OPTIMIZATION_r10.md):
    # the bfs/sssp-style restructure — stats job before pinning, sym pinned
    # at a narrow loop-conf width, SHUFFLE_HASH co-partitioned rounds —
    # measured SLOWER on the cascade graph (components stage 4.02 -> 4.86 s;
    # the setup countDistinct pass and the narrow-width round probes cost
    # more than the removed AQE stage jobs), and hints-only was a wash
    # (3.4-4.0 old vs 3.6-3.7 hinted across four interleaved JVMs). The r9
    # shape below stays: session-width pinned sym, AQE on, SMJ rounds.
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
        # pin the persisted partitioning to the per-round join key: every
        # iteration joins on sym.a, and a persisted hash partitioning on
        # `a` (matching the session's shuffle-partition count) lets
        # EnsureRequirements skip re-shuffling the edge list each round —
        # only the small (node, label) side moves.
        # repartition BEFORE distinct (r9): HashPartitioning(a) satisfies
        # the dedup aggregate's ClusteredDistribution((a, b)) — rows
        # equal on (a, b) share a, so one exchange serves both, where
        # distinct-then-repartition paid two
        .repartition(F.col("a"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    prev_stepped = None
    try:
        # round 1 fused into initialization: with label(u) = u, the first
        # propagation is just min(node, min neighbor) — one aggregation,
        # no join, one fewer full round below. Map-side complete over
        # sym's pinned hash(a) layout — no exchange.
        labels = (
            sym.groupBy(F.col("a").alias("node"))
            .agg(F.min("b").alias("__nbr"))
            .select(
                "node", F.least(F.col("node"), F.col("__nbr")).alias("label")
            )
            .persist()
        )
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym.a == labels.node)
                .groupBy(F.col("b").alias("node2"))
                .agg(F.min("label").alias("nbr_label"))
            )
            # localCheckpoint (eager) rather than persist: it also truncates
            # lineage, so the logical plan stays O(1) per round instead of
            # nesting every previous iteration (re-planning an N-round tree
            # is quadratic driver time, and worse at real scale). The
            # changed COUNT rides along as an observed metric (r9):
            # CollectMetricsExec accumulates it during the checkpoint's own
            # materialization, so the convergence check costs ZERO extra
            # jobs per round (it was previously a second scan job over the
            # materialized blocks — pure dispatch latency at any scale)
            new_label = F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            )
            obs = Observation()
            stepped = record_prechk(
                labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
                .select(
                    "node",
                    new_label.alias("new_label"),
                    (new_label != F.col("label")).alias("changed"),
                )
                .observe(obs, F.count_if(F.col("changed")).alias("n_changed"))
            ).localCheckpoint(eager=True)
            new_labels = stepped.select("node", F.col("new_label").alias("label"))
            changed = int(obs.get["n_changed"])
            # release the previous round's blocks DETERMINISTICALLY: the
            # initial frame is persisted (unpersist works); later rounds
            # are local checkpoints, whose RDD-level blocks
            # DataFrame.unpersist cannot free — release_local_checkpoint
            # walks to the LogicalRDD (found r5; relying on the
            # ContextCleaner left every round's node-sized block set
            # cached until some future GC)
            labels.unpersist()
            if prev_stepped is not None:
                release_local_checkpoint(prev_stepped)
            prev_stepped = stepped
            labels = new_labels
            if changed == 0:
                # the FINAL round's checkpoint backs the returned frame —
                # release it at the harness's next release_tracked(), not
                # here (before this, every call leaked one node-sized
                # block set into the session for good)
                defer_checkpoint_release(stepped)
                return labels.select("node", F.col("label").alias("component"))
        if prev_stepped is not None:
            defer_checkpoint_release(prev_stepped)
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} iterations")
    finally:
        sym.unpersist()


def dedup_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """The kept corpus: one canonical (minimum-id) document per near-dup
    cluster plus all documents in no cluster. Output: (doc_id, component)
    where component == doc_id for survivors of clusters and singletons."""
    comp = connected_components(pairs, src_col, dst_col)
    clustered = docs.join(comp, docs[id_col] == comp.node, "left").select(
        id_col, F.coalesce(F.col("component"), F.col(id_col)).alias("component")
    )
    return clustered.where(F.col(id_col) == F.col("component")).select(
        id_col, "component"
    )



def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    broadcast_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    with a DETERMINISTIC update rule: each round every node adopts the
    neighbor label with the highest count, ties broken by the SMALLEST
    label — integer-only arithmetic, so the fixed-round result is
    engine-exact and Python-replayable (tests pin it). Labels start as
    node ids; after ``n_iter`` rounds (node, community) is returned.
    Complements connected components (structure only) and k-core
    (density only): LPA finds dense sub-regions inside one component.

    Physical shape per round (the pagerank loop discipline):
    - the (node, label) frame joins the STATIC symmetrized adjacency —
      broadcast while the node frame fits the budget, so the edge
      partitions never move;
    - one partial-aggregated groupBy (node, neighbor_label) then the
      per-node argmax as a max over the orderable (count, -label)
      struct — map-side combine on both, bytes per (node, label) pair;
    - localCheckpoint truncates lineage each round; the loop builds the
      same lazy chain as pagerank and ONE action materializes it before
      the adjacency cache releases.

    The adjacency is symmetrized from a canonical (src < dst) edge list
    (both directions) so propagation is undirected."""
    spark = edges.sparkSession
    adj = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionAll(
            edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
        .persist()
    )
    # ONE aggregate job yields both setup statistics (r9; was a distinct
    # count + a count = two passes over the cached adjacency)
    row = adj.agg(
        F.countDistinct("node").alias("n"), F.count("*").alias("m")
    ).collect()[0]
    n, m = int(row["n"]), int(row["m"])
    bcast = n <= broadcast_max_nodes
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    np_edges = max(4, min(shuffle_n, m // 200_000 + 1))
    adj_p = adj.repartition(np_edges, "nbr").persist()
    adj_p.count()
    adj.unpersist()

    # loop-state conf window (r9): per-round frames are node-domain rows
    # (see util.iterative_loop_conf; no-op past the broadcast budget)
    with iterative_loop_conf(spark, n, bcast=bcast):
        labels = adj_p.select("node").distinct().select(
            "node", F.col("node").alias("label")
        )
        intermediates = []
        for _ in range(n_iter):
            l_side = labels.select(F.col("node").alias("nbr"), "label")
            if bcast:
                l_side = F.broadcast(l_side)
            votes = (
                adj_p.join(l_side, "nbr")
                .groupBy("node", "label")
                .agg(F.count("*").alias("c"))
            )
            new_labels = (
                votes.groupBy("node")
                .agg(
                    F.max(
                        F.struct(
                            F.col("c").alias("c"), (-F.col("label")).alias("neg")
                        )
                    ).alias("__m")
                )
                .select("node", (-F.col("__m.neg")).alias("label"))
            )
            labels = record_prechk(new_labels).localCheckpoint(eager=False)
            intermediates.append(labels)
        labels.count()
    adj_p.unpersist()
    # checkpoint blocks are RDD-level (DataFrame.unpersist is a no-op on
    # them); free every round's blocks except the returned frame's, which
    # the harness frees at its next release_tracked()
    for inter in intermediates:
        if inter is not labels:
            release_local_checkpoint(inter)
    defer_checkpoint_release(labels)
    return labels.select("node", F.col("label").alias("community"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame | None = None,
    max_hops: int = 4,
    broadcast_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Multi-source BFS layers: (node, hops) for every node within
    ``max_hops`` of the seed set over the UNDIRECTED graph — the
    path/distance primitive beside min-label CC (reachability), LPA
    (density) and PageRank (centrality). hops = distance to the NEAREST
    seed; nodes further than ``max_hops`` are absent from the output.

    ``seeds`` is a 1-column (node) frame — relational, so no driver value
    is ever collected; None seeds the minimum node id (a 1-row aggregate).
    Hop counts are INTEGER-exact, so the fixed-round result is engine-
    portable and the oracle unrolls the rounds (the LPA discipline);
    rounds past frontier exhaustion are no-ops, not divergence.

    Physical shape per round (the pagerank loop discipline): the frontier
    (new nodes only, never the full dist set) joins the STATIC symmetrized
    adjacency — broadcast while the node frame fits the budget, so edge
    partitions never move; one partial-aggregated distinct on the
    neighbor side; an anti-join against the accumulated distance frame
    admits only unseen nodes. localCheckpoint truncates each frontier's
    lineage; ONE action materializes the chain before the adjacency cache
    releases. Per-round bytes moved: (frontier + new-node) ids, never
    edges, never payloads."""
    adj0 = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionAll(
            edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
        .persist()
    )
    row = adj0.agg(
        F.countDistinct("node").alias("n"), F.count("*").alias("m")
    ).collect()[0]
    n, m = int(row["n"]), int(row["m"])
    bcast = n <= broadcast_max_nodes
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    np_edges = max(4, min(shuffle_n, m // 200_000 + 1))
    adj = adj0.repartition(np_edges, "node").persist()
    adj.count()
    adj0.unpersist()

    if seeds is None:
        # the 1-row min aggregate yields (NULL) on an EMPTY graph — filter
        # it so the result is zero rows, not a phantom (NULL, 0) row (the
        # permutation-test empty-shape discipline; mirrored in _bfs_sql)
        seeds = adj.agg(F.min("node").alias("node")).where(
            F.col("node").isNotNull()
        )
    else:
        # a caller-supplied seeds frame is untrusted: duplicate seed ids
        # would emit duplicate (node, 0) rows (and double every later
        # anti-join's "seen" semantics held only by accident). Seed ids
        # absent from the edge set are KEPT by design — they appear at
        # hop 0 with no reachable neighbors, the standard multi-source
        # BFS contract for isolated sources.
        seeds = seeds.select("node").distinct()
    # hop 0 is checkpointed like every later round: its lineage reaches
    # through adj into the CALLER'S edge subtree (often an expensive
    # self-join), and the final action on the returned union would
    # otherwise rebuild that subtree after adj.unpersist() below just to
    # recompute this one frame.
    # loop-state conf window (r9): per-round frames are node-domain rows
    # (see util.iterative_loop_conf; no-op past the broadcast budget)
    with iterative_loop_conf(spark, n, bcast=bcast):
        frontier = defer_checkpoint_release(
            record_prechk(seeds.select("node", F.lit(0).cast("int").alias("hops")))
            .localCheckpoint(eager=False)
        )
        dist = frontier
        for h in range(1, max_hops + 1):
            f_side = frontier.select("node")
            if bcast:
                f_side = F.broadcast(f_side)
            nbrs = (
                adj.join(f_side, "node")
                .select(F.col("nbr").alias("node"))
                .distinct()
            )
            seen = dist.select("node")
            if bcast:
                seen = F.broadcast(seen)
            frontier = defer_checkpoint_release(
                record_prechk(
                    nbrs.join(seen, "node", "left_anti")
                    .select("node", F.lit(h).cast("int").alias("hops"))
                ).localCheckpoint(eager=False)
            )
            dist = dist.unionByName(frontier)
        dist.count()
    adj.unpersist()
    # every frontier checkpoint feeds the RETURNED union, so none can be
    # released here — all are registered for the harness's next
    # release_tracked() (the reference-drop story was wrong: checkpoint
    # blocks are pinned at the RDD level and NEVER free on their own)
    return dist.select("node", "hops")


def sssp_bounded(
    edges: DataFrame,
    weight_col: str = "w",
    n_rounds: int = 6,
    seeds: DataFrame | None = None,
    broadcast_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Bounded-hop weighted shortest distances: (node, dist) where dist =
    the minimum total weight over paths of at most ``n_rounds`` edges
    from the seed set, over the UNDIRECTED weighted graph. Nodes not
    reachable within ``n_rounds`` edges are absent — the weighted
    generalization of bfs_hops (set every weight to 1 and dist == hops).

    FIXED round count by design, not a convergence loop: "min path
    weight over <= R edges" is a well-defined quantity both engines
    compute identically, so the oracle unrolls the same R Bellman-Ford
    rounds (oracles._sssp_sql) and rounds past convergence are no-ops —
    the BFS/LPA discipline. Integer weights make every distance and
    comparison integer-exact: no float path-sum margins exist.

    Physical shape per round (frontier-restricted relaxation — provably
    equal to full relaxation per round, since an unimproved node's
    contribution was already applied with the same distance in an
    earlier round):
    - the frontier (nodes improved last round, never the full dist set)
      joins the STATIC symmetrized adjacency — broadcast while the node
      frame fits the budget, so edge partitions never move;
    - candidate distances partial-aggregate (min) to node domain;
    - a node-keyed outer merge against the accumulated dist frame keeps
      the row-minimum and emits the improved set as the next frontier.
    localCheckpoint truncates each round's lineage (lazy — no per-round
    action; ONE count materializes the chain before the adjacency cache
    releases). Per-round bytes: (node, dist) pairs, never edges, never
    payloads. At 100 TB: adjacency stays partitioned in place; the dist
    frame is node-domain-sized.
    """
    w = F.col(weight_col).cast("long")
    adj0 = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"), w.alias("w"))
        .unionAll(
            edges.select(
                F.col("dst").alias("node"), F.col("src").alias("nbr"), w.alias("w")
            )
        )
        .persist()
    )
    row = adj0.agg(
        F.countDistinct("node").alias("n"), F.count("*").alias("m")
    ).collect()[0]
    n, m = int(row["n"]), int(row["m"])
    bcast = n <= broadcast_max_nodes
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    np_edges = max(4, min(shuffle_n, m // 200_000 + 1))
    adj = adj0.repartition(np_edges, "node").persist()
    adj.count()
    adj0.unpersist()

    if seeds is None:
        # empty graph -> the 1-row min aggregate is (NULL) -> zero rows,
        # not a phantom (NULL, 0) row (the bfs_hops discipline)
        seeds = adj.agg(F.min("node").alias("node")).where(
            F.col("node").isNotNull()
        )
    else:
        seeds = seeds.select("node").distinct()
    # loop-state conf window (r9): the per-round frames are node-domain
    # rows, so the merge exchange runs at the frame-proportional width
    # and without AQE's per-exchange stage jobs; no-op past the
    # broadcast budget (see util.iterative_loop_conf)
    with iterative_loop_conf(spark, n, bcast=bcast):
        dist = defer_checkpoint_release(
            record_prechk(seeds.select("node", F.lit(0).cast("long").alias("dist")))
            .localCheckpoint(eager=False)
        )
        frontier = dist
        for _ in range(n_rounds):
            f_side = frontier
            if bcast:
                f_side = F.broadcast(f_side)
            cand = (
                adj.join(f_side, "node")
                .select(
                    F.col("nbr").alias("node"),
                    (F.col("dist") + F.col("w")).alias("d"),
                )
            )
            # merge = UNION ALL + one partial-aggregated min (the oracle's
            # exact shape): a full-outer join can't broadcast in Spark, so
            # this keeps the per-round merge to ONE node-domain shuffle with
            # map-side combine — no join at all
            merged = defer_checkpoint_release(
                dist.select(
                    "node", F.col("dist").alias("d"), F.lit(True).alias("__old")
                )
                .unionByName(cand.select("node", "d", F.lit(False).alias("__old")))
                .groupBy("node")
                .agg(
                    F.min("d").alias("dist"),
                    F.min(F.when(F.col("__old"), F.col("d"))).alias("__od"),
                )
                .select(
                    "node",
                    "dist",
                    (
                        F.col("__od").isNull() | (F.col("dist") < F.col("__od"))
                    ).alias("__improved"),
                )
                .transform(record_prechk)
                .localCheckpoint(eager=False)
            )
            frontier = merged.where("__improved").select("node", "dist")
            dist = merged.select("node", "dist")
        dist.count()
    adj.unpersist()
    return dist.select("node", "dist")


def bfs_label_budget(
    edges: DataFrame,
    weak_col: str = "is_weak",
    max_weak: int = 1,
    max_hops: int = 4,
    seeds: DataFrame | None = None,
    broadcast_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Label-constrained reachability: (node, hops, weak_used) for every
    node reachable from the seed set within ``max_hops`` edges using AT
    MOST ``max_weak`` weak edges (``weak_col`` is 0/1 per edge) — the
    budgeted-label path primitive (the property-path class: "reach v via
    strong ties, spending at most K weak hops"). hops = minimum hop
    count under the budget; weak_used = minimum weak count among those
    hop-minimal paths (lexicographic (hops, weak) argmin — integer-
    deterministic).

    This is BFS over the PRODUCT graph of (node, weak-spent) automaton
    states: a strong edge maps (v, w) -> (nbr, w), a weak edge maps
    (v, w) -> (nbr, w+1) while w+1 <= max_weak. State domain is
    (max_weak+1) x nodes — node-domain bounded, so the 100 TB posture is
    bfs_hops' unchanged: the frontier STATE set (never the full seen
    set) joins the static pinned adjacency under the broadcast budget,
    an anti-join on (node, w) admits unseen states, every frontier
    localCheckpoints (lazy) with deferred release, and ONE action
    materializes the chain. Integer-exact end to end, so the
    fixed-round result is engine-portable and the oracle unrolls the
    same rounds over state pairs (oracles._label_bfs_sql)."""
    wcol = F.col(weak_col).cast("int")
    adj0 = (
        edges.select(
            F.col("src").alias("node"), F.col("dst").alias("nbr"), wcol.alias("wk")
        )
        .unionAll(
            edges.select(
                F.col("dst").alias("node"), F.col("src").alias("nbr"), wcol.alias("wk")
            )
        )
        .persist()
    )
    row = adj0.agg(
        F.countDistinct("node").alias("n"), F.count("*").alias("m")
    ).collect()[0]
    n, m = int(row["n"]), int(row["m"])
    bcast = n * (max_weak + 1) <= broadcast_max_nodes
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    np_edges = max(4, min(shuffle_n, m // 200_000 + 1))
    adj = adj0.repartition(np_edges, "node").persist()
    adj.count()
    adj0.unpersist()

    if seeds is None:
        seeds = adj.agg(F.min("node").alias("node")).where(
            F.col("node").isNotNull()
        )
    else:
        seeds = seeds.select("node").distinct()
    # automaton start state: (seed, w=0) at hop 0.
    # loop-state conf window (r9): per-round frames are state-domain rows
    # ((max_weak+1) x nodes — the bcast predicate's own bound; see
    # util.iterative_loop_conf; no-op past the broadcast budget)
    with iterative_loop_conf(spark, n * (max_weak + 1), bcast=bcast):
        frontier = defer_checkpoint_release(
            record_prechk(
                seeds.select(
                    "node",
                    F.lit(0).cast("int").alias("w"),
                    F.lit(0).cast("int").alias("hops"),
                )
            ).localCheckpoint(eager=False)
        )
        seen = frontier
        for h in range(1, max_hops + 1):
            f_side = frontier.select("node", "w")
            if bcast:
                f_side = F.broadcast(f_side)
            cand = (
                adj.join(f_side, "node")
                .select(
                    F.col("nbr").alias("node"),
                    (F.col("w") + F.col("wk")).alias("w"),
                )
                .where(F.col("w") <= max_weak)
                .distinct()
            )
            s_side = seen.select("node", "w")
            if bcast:
                s_side = F.broadcast(s_side)
            frontier = defer_checkpoint_release(
                record_prechk(
                    cand.join(s_side, ["node", "w"], "left_anti")
                    .select("node", "w", F.lit(h).cast("int").alias("hops"))
                ).localCheckpoint(eager=False)
            )
            seen = seen.unionByName(frontier)
        seen.count()
    adj.unpersist()
    # collapse automaton states to the node answer: lexicographic
    # (hops, weak) min — first-reached hop, thriftiest budget at that hop
    best = F.min(F.struct(F.col("hops"), F.col("w"))).alias("__b")
    return (
        seen.groupBy("node")
        .agg(best)
        .select(
            "node",
            F.col("__b.hops").alias("hops"),
            F.col("__b.w").alias("weak_used"),
        )
    )
