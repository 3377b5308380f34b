"""Distributed graph operators: connected components in log-diameter rounds.

The near-duplicate clustering step of a 100 TB dedup pipeline is a
connected-components problem over the candidate-pair graph. Plain
min-label propagation needs one round per unit of graph DIAMETER; on
pathological chains (crawl mirrors, boilerplate families) that is
hundreds of joins. This operator interleaves a pointer-jumping shortcut
(label(u) <- label(label(u))) with each propagation round — the classic
path-doubling trick — so the label distance covered doubles every round
and convergence is O(log diameter) rounds, each round a constant number
of shuffles (one edge join + aggregate, one label self-join).

The driver-side loop is ONLY the convergence check (a count per round,
log-diameter of them) — labels themselves never leave the cluster.

Lineage discipline: each round ends in ``localCheckpoint(eager=True)``,
not ``persist``. The shortcut self-join makes the LOGICAL plan double per
round — without truncation the plan tree grows 2^rounds and the planner
itself OOMs around round 10 (measured on a 200-node chain). Checkpointing
materializes the round's labels and resets lineage to a leaf, so every
round plans the same constant-size tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", *, max_rounds: int = 50
) -> DataFrame:
    """Label every node of the undirected graph with its component's
    minimum node id. ``edges`` must already contain both directions of
    each edge (symmetrize with a union before calling if not).

    Returns ``(node, label)``. Deterministic: labels are exact component
    minima, independent of partitioning or round count.
    """
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(max_rounds):
        # propagate: l(u) <- min(l(u), min over neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nlabel"))
        )
        propagated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least("label", F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        # shortcut (path doubling): l(u) <- l(l(u)). Labels are node ids
        # of the same component, so the lookup side is labels itself.
        # Deferred until round 2: clique-shaped dedup graphs converge in
        # 1-2 propagation rounds and would pay the extra self-join for
        # nothing; deep chains (where doubling matters) still get
        # log-diameter behavior, just offset by two cheap rounds.
        if rnd >= 2:
            lookup = propagated.select(
                F.col("node").alias("l_node"), F.col("label").alias("l_label")
            )
            propagated = (
                propagated.join(lookup, propagated.label == F.col("l_node"), "left")
                .select(
                    "node",
                    F.least("label", F.coalesce("l_label", "label")).alias("label"),
                )
            )
        new_labels = propagated.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label")).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def pagerank(edges: DataFrame, n_iter: int, *, scale: int = 1_000_000,
             damp_num: int = 85, damp_den: int = 100,
             checkpoint_every: int = 8,
             assume_distinct: bool = False) -> DataFrame:
    """Integer-exact PageRank over a directed edge list, fixed iterations.

    Classic PR is float-valued and order-sensitive; this variant keeps
    every quantity a BIGINT so the result is bit-identical on any engine
    and any partitioning: ranks start at ``scale`` per node, each
    iteration sends ``r(u) div outdeg(u)`` along every edge, and the new
    rank is ``(1-d)*scale + (damp_num * inbound_sum) div damp_den`` —
    floor division everywhere, all operands positive. The fixed-point
    drift vs float PR is < 1/scale per iteration, irrelevant for ranking.

    Plan shape per iteration: one equi-join of the (persisted) degree-
    annotated edge list with the K-column rank frame on src, one groupBy
    dst (map-side partial sums collapse per-partition contributions
    before the shuffle), one left join back onto the node set to re-seed
    dangling/no-inbound nodes. Rank frames are NOT persisted — each one
    has exactly one consumer — but every ``checkpoint_every`` iterations
    the frame localCheckpoints so deep runs plan in constant space (same
    lineage discipline as connected_components above).

    Returns ``(node, rank)`` with rank in micro-units (scale=1e6).

    ``assume_distinct=True`` skips the defensive edge ``distinct()`` —
    PR degrees/contributions are defined over the distinct edge set, so
    callers whose edge list is distinct by construction (both registry
    queries: one feeds a ``.distinct()`` frame, the other a union of
    disjoint key namespaces over a distinct base) save a full edge
    shuffle; callers that cannot prove it keep the default.
    """
    e = edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # The raw edge frame feeds TWO subtrees of ed's plan (the deg
    # aggregate and the join probe); a lazy persist fills on ed's
    # materialization and collapses the second subtree to a cache read.
    # No eager e.count(): the consumers run sequentially inside ed's one
    # action, so a blocking pre-materialization job bought nothing
    # (measured r13->r14: three eager counts per call was the prime
    # suspect in textrank's 0.76x — every count is a full driver round
    # trip before any iteration starts).
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # ed is persisted CLUSTERED on src: every iteration probes it with a
    # src-keyed join, so baking hashpartitioning(src) into the cache lets
    # each iteration reuse the layout instead of re-exchanging the edge
    # frame once per iteration when the rank side is too big to
    # broadcast (guide §2.4 — at bench scale AQE broadcasts the rank
    # frame either way; at corpus scale this is the difference between
    # n_iter edge shuffles and zero).
    ed = e.join(deg, "src").repartition("src").persist()
    ed.count()  # materialize once; every iteration probes this frame
    # nodes derives from ed's cache (same row set as e: the inner join
    # on src keeps every edge) through ONE reference — an explode of the
    # endpoint pair — so its build is a single cached scan, not two
    # union legs re-reading e.
    nodes = (ed.select(F.explode(F.array("src", "dst")).alias("node"))
             .distinct().persist())
    # eager, like ed: nodes appears TWICE per iteration (contrib probe +
    # re-seed left join), so an unmaterialized persist leaves its whole
    # explode+distinct subtree duplicated 2x per iteration in the plan —
    # materializing collapses every later reference to one cached scan
    nodes.count()
    e.unpersist()
    base = (scale * (damp_den - damp_num)) // damp_den
    ranks = nodes.withColumn("rank", F.lit(int(scale)).cast("long"))
    for it in range(1, n_iter + 1):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("rank div d").alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.expr(
                    f"({damp_num} * coalesce(s, 0L)) div {damp_den}"))
                .cast("long").alias("rank"),
            )
        )
        # No per-iteration persist: each rank frame feeds EXACTLY one
        # consumer (the next iteration's contrib join), so caching it
        # only adds a materialization job — the reused frames are ed and
        # nodes, persisted above. Lineage still needs periodic truncation
        # on deep runs: the logical plan grows linearly per iteration and
        # the planner's cost becomes visible around ~30 joins.
        if it % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    from cliqz_etl_spark.operators.cache import track
    track(ed)
    track(nodes)
    return ranks
