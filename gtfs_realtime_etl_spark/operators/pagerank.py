"""Distributed PageRank over an edge DataFrame.

The second iterative graph operator next to
``operators/clusters.py::connected_components`` (driver prompt: custom
iterative algorithms are engine territory, with the driver gate's
weaker rows-only check).  Relational power iteration:

    rank_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} rank_t(u)/deg(u)
                                    + dangling_mass_t / N )

Each round is ONE join (ranks x out-edges on the source) and ONE
aggregation (contributions by destination) — both shuffle on the same
key domain, so a production caller can pre-partition edges by ``s``
once and every round reuses that exchange.  Dangling-node mass (nodes
with no out-edges) is redistributed uniformly, keeping the ranks a
probability distribution (sums to 1), which is also the convergence
invariant the test asserts.

Lineage control: like the label-propagation loop, each round
``localCheckpoint``s the new ranks — without it round t's plan embeds
t joins and Catalyst analysis goes quadratic.  Iteration count is
fixed (power iteration converges geometrically at rate ~d); a
tolerance-based stop would add a driver round-trip per round for no
asymptotic gain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 15,
    damping: float = 0.85,
    src: str = "s",
    dst: str = "d",
    dangling: str = "collect",
    materialize_edges: bool = True,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds; ranks sum to 1.

    ``edges`` are directed (src -> dst); duplicate edges count as
    parallel edges (weight = multiplicity / out-degree).

    SIDE EFFECT: with ``materialize_edges=True`` (default) the call
    EAGERLY runs a Spark job to localCheckpoint the edge input before
    returning — nodes, out-degrees, and the per-round join table all
    derive from it, and without the pin each would re-run the caller's
    (possibly expensive) edge-generation lineage, e.g. a k-NN
    candidate join.  Two caveats: the returned DataFrame is built on
    localCheckpoint blocks, which are NOT recoverable on executor loss
    (a preempted executor fails the computation rather than recomputing
    lineage — acceptable on static local/driver sessions, not on
    clusters with dynamic allocation); and plan construction is no
    longer lazy.  Callers with cheap edge lineage or their own
    persistence should pass ``materialize_edges=False`` (edges are then
    re-read per derivation; correct either way).  NOTE this flag only
    removes the up-front edge pins: the per-round rank localCheckpoint
    below is unconditional (eager under ``dangling="collect"``, lazy
    under ``dangling="none"`` but still checkpoint-backed once
    evaluated), so executor loss mid-iteration invalidates checkpoint
    blocks and fails the fit regardless of ``materialize_edges``.  On
    preemptible clusters rerun the fit (it is deterministic) or snapshot
    ranks between rounds with your own ``persist(DISK_ONLY)``.

    ``dangling="collect"`` (default) measures the rank mass held by
    nodes without out-edges each round (one driver action per round)
    and redistributes it uniformly.  ``dangling="none"`` asserts the
    caller's graph has NO dangling nodes (e.g. a k-NN graph, where
    every node has out-degree k, or any undirected graph) and skips
    the per-round driver round-trip — 10 iterations become 10 pure
    shuffle rounds with zero driver synchronization.  If the caller's
    guarantee is wrong the ranks silently leak mass (sum < 1): the
    convergence invariant the tests assert.
    """
    if dangling not in ("collect", "none"):
        raise ValueError(f"dangling must be 'collect' or 'none', got {dangling!r}")
    # Materialize the edge list ONCE up front (opt-out via
    # materialize_edges=False — see docstring for the eager-job and
    # executor-loss caveats): nodes, out-degrees, and the
    # degree-annotated edge table all derive from it.
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if materialize_edges:
        e = e.localCheckpoint(eager=True)
    nodes = e.select(F.col("s").alias("node")).unionAll(
        e.select(F.col("d").alias("node"))
    ).distinct()
    if materialize_edges:
        nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # Edges with the source's degree attached — every round joins
    # against this same table.
    e_deg = e.join(out_deg, "s")
    if materialize_edges:
        e_deg = e_deg.localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            ranks.join(e_deg, ranks["node"] == e_deg["s"], "inner")
            .select(
                F.col("d").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        if dangling == "collect":
            # Dangling mass: rank held by nodes with no out-edges.
            mass = (
                ranks.join(out_deg, ranks["node"] == out_deg["s"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )
        else:
            mass = 0.0
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(mass / n))
            ).alias("rank"),
        )
        if dangling == "collect":
            # The round is materialized anyway for the mass
            # measurement, so an eager checkpoint costs nothing extra
            # and keeps the next round's plan O(1).
            ranks = ranks.localCheckpoint(eager=True)
        # With dangling="none" the rounds CHAIN in one lazy plan: with
        # materialize_edges the per-round join table and node list are
        # already checkpoint leaves, so round t's tree is t chained
        # (join + agg + join) blocks over flat leaves — linear, one
        # Catalyst pass at the caller's single action.  The per-round
        # LAZY localCheckpoint this replaces (round-12) was not free:
        # every call synchronously physical-planned and codegen'd its
        # subtree (~0.2-0.3 s x iterations of driver-side stall) to
        # build the checkpoint RDD, serializing exactly the per-round
        # barrier the lazy form was meant to avoid.  (The quadratic
        # Catalyst blowup the old comment feared applies to the
        # UNMATERIALIZED edge path: there every round re-embeds the
        # caller's full edge lineage; materialize_edges=False callers
        # accept that documented trade.)
    return ranks
