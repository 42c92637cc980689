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
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds; ranks sum to 1.

    ``edges`` are directed (src -> dst); duplicate edges count as
    parallel edges (weight = multiplicity / out-degree).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # Edges with the source's degree attached, materialized once —
    # every round joins against this same table.
    e_deg = e.join(out_deg, "s").localCheckpoint(eager=True)

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
        # Dangling mass: rank held by nodes with no out-edges.
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
