"""Latest-wins CDC merge (the ``MERGE INTO`` upsert analog).

A lakehouse without a table format still needs the merge step: apply a
batch of upserts (and optionally deletes) to a base snapshot, keeping
exactly one row per key — the highest version wins, updates beating
base on version ties.

Spark-first shape: ``union`` + one ``row_number`` window partitioned by
the key — a SINGLE shuffle on the merge key, never a join (a
full-outer-join merge shuffles both sides AND builds join state; the
union form shuffles the same rows once and streams them through one
window).  Spark additionally inserts a map-side ``WindowGroupLimit``
(local top-1 per key) BEFORE the exchange, so locally-colocated
duplicate versions collapse pre-shuffle.

Honest scale note: the union destroys any bucketed distribution of the
base, so a bucketed base is STILL re-shuffled here (verified on the
physical plan — one Exchange over the whole union).  A shuffle-free
merge against a bucketed base needs the join form (base-side
distribution preserved, update batch broadcast/shuffled) at the cost
of join state; the union form wins when the snapshot is modest
relative to cluster shuffle capacity — which it is by construction,
being bounded by live key cardinality, not event volume.

Reference parity: the reference pipeline is append-only (its lake has
no upsert path — etl/runtime/handler.py writes immutable ticks), so
this operator is part of the beyond-reference training-data surface,
not a port.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Source priority — updates beat base when versions tie.
_SRC_BASE = 0
_SRC_UPDATES = 1


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Return the merged snapshot: one row per key, latest version wins.

    - ``keys``: merge key columns (must exist on both sides).
    - ``version_col``: monotonically increasing change version; on a
      tie the update row wins (deterministic, mirrors MERGE semantics
      where the incoming batch overrides the target).
    - ``delete_col``: optional boolean column on ``updates``; a winning
      row with it set true is dropped from the output (tombstone).
    """
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    cols = base.columns
    if set(cols) != set(c for c in updates.columns if c != delete_col):
        raise ValueError(
            f"schema mismatch: base={cols} updates={updates.columns}"
        )

    b = base.select(*cols).withColumn("_src", F.lit(_SRC_BASE))
    u = updates.select(
        *cols,
        (
            F.col(delete_col) if delete_col else F.lit(False)
        ).alias("_deleted"),
    ).withColumn("_src", F.lit(_SRC_UPDATES))
    b = b.withColumn("_deleted", F.lit(False))

    w = Window.partitionBy(*keys).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    merged = (
        b.unionByName(u)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col("_deleted")))
        .select(*cols)
    )
    return merged
