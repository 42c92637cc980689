"""Watermarked stream-stream interval join (+ batch backfill twin).

The last Structured Streaming operator class the engine needed: joining
two event streams on a key within an event-time interval (clicks that
led to a purchase within the attribution window, sensor pairs within a
tolerance, …).  Spark buffers both sides in state; the watermark plus
the two-sided time-bound condition lets it evict rows once no future
match is possible, so state is O(events inside the interval window),
not O(stream).

The same function runs on batch inputs (identical join condition, no
watermarks) — the backfill twin used for equivalence tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` joined to ``right`` rows with the same ``on`` key
    whose event time lies in ``[left_ts + lower, left_ts + upper]``
    seconds.  Timestamp columns must be TimestampType.

    Streaming inputs get watermarks on both sides (required by Spark for
    state eviction in stream-stream joins); batch inputs run the same
    condition directly.  Column names are suffixed ``_l`` / ``_r``.
    """
    l = left.select(
        F.col(on).alias("_k"), *[F.col(c).alias(f"{c}_l") for c in left.columns if c != on]
    )
    r = right.select(
        F.col(on).alias("_kr"), *[F.col(c).alias(f"{c}_r") for c in right.columns if c != on]
    )
    lt, rt = f"{left_ts}_l", f"{right_ts}_r"
    if left.isStreaming:
        l = l.withWatermark(lt, watermark)
    if right.isStreaming:
        r = r.withWatermark(rt, watermark)
    cond = (
        (l["_k"] == r["_kr"])
        & (r[rt] >= l[lt] + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (r[rt] <= l[lt] + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return l.join(r, cond, how).select(
        F.col("_k").alias(on),
        *[c for c in l.columns if c not in ("_k",)],
        *[c for c in r.columns if c not in ("_kr",)],
    )
