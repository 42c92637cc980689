"""Bucketed interval-overlap (range) join.

Spark has no native interval-overlap join: expressing ``a.start <=
b.end AND b.start <= a.end`` directly gives BroadcastNestedLoopJoin /
CartesianProduct — an O(n*m) plan that dies long before 100 TB.  The
standard distributed rewrite (used by Spark range-join extensions and
the interval-join literature) is time bucketing:

1. replicate each interval to every fixed-width bucket it touches
   (``floor(start/W) .. floor(end/W)``, integer division — ns-scale
   epochs exceed double precision so float math is banned here);
2. equi-join on ``(keys..., bucket)`` — a plain shuffled hash join,
   so Catalyst/AQE handle skew and parallelism normally;
3. keep pairs that truly overlap (the residual predicate);
4. de-duplicate *without a distinct shuffle*: a pair meeting in k
   shared buckets is emitted only from the canonical one —
   ``bucket == floor(max(a.start, b.start)/W)`` — which every
   overlapping pair meets in exactly once.

Replication factor is ``1 + interval_len/W``: pick ``W`` near the
typical interval length so rows replicate ~2x.  ``max_buckets`` guards
against a pathological interval exploding into millions of rows (fail
loud, don't OOM an executor).

Beyond the reference surface (its joins are equi-only — SURVEY.md
SS2.3); this is the batch foundation for co-activity / conflict
detection, and the batch twin of ``streaming/joins.py::interval_join``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_width: int,
    on: list[str] | None = None,
    residual: Column | None = None,
    max_buckets: int = 4096,
    num_partitions: int | None = None,
) -> DataFrame:
    """Join rows whose [start, end] intervals overlap (closed bounds).

    ``left_bounds`` / ``right_bounds`` name integer start/end columns
    (epoch ns/us/s — any unit, as long as ``bucket_width`` matches).
    Column names must be disjoint between the two sides except for
    ``on`` equi-keys.  ``residual`` adds an extra post-join predicate.
    Zero-length intervals (start == end) participate normally.

    ``num_partitions`` pins the pair-join parallelism: interval rows
    are byte-light but the per-pair work downstream is not, and AQE's
    size-based coalescing would otherwise fuse the join into one or two
    tasks.  A user-specified repartition on the bucket key is
    AQE-exempt and already satisfies the join's distribution
    requirement, so pinning adds no extra exchange.
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    on = list(on or [])

    overlap_keys = (set(left.columns) & set(right.columns)) - set(on)
    if overlap_keys:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap_keys)}; "
            "rename before joining"
        )

    def buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        b0 = F.expr(f"CAST({s} DIV {bucket_width} AS BIGINT)")
        b1 = F.expr(f"CAST({e} DIV {bucket_width} AS BIGINT)")
        guard = F.when(
            b1 - b0 >= F.lit(max_buckets),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"overlap_join: interval spans >= {max_buckets} buckets "
                        f"of width {bucket_width}; raise bucket_width or "
                        "max_buckets ("
                    ),
                    F.col(s).cast("string"),
                    F.lit(".."),
                    F.col(e).cast("string"),
                    F.lit(")"),
                )
            ),
        ).otherwise(b1)
        return df.withColumn("_rj_bucket", F.explode(F.sequence(b0, guard)))

    lx = buckets(left, ls, le)
    rx = buckets(right, rs, re_).withColumnRenamed("_rj_bucket", "_rj_bucket_r")
    if num_partitions is not None:
        lx = lx.repartition(num_partitions, *on, "_rj_bucket")
        rx = rx.repartition(num_partitions, *on, "_rj_bucket_r")

    cond = lx["_rj_bucket"] == rx["_rj_bucket_r"]
    for k in on:
        cond = cond & (lx[k] == rx[k])

    joined = lx.join(rx, cond, "inner")
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    # Canonical-bucket emission: the first bucket both intervals share
    # is the one containing max(start_a, start_b).
    canonical = F.col("_rj_bucket") == F.expr(
        f"CAST(greatest({ls}, {rs}) DIV {bucket_width} AS BIGINT)"
    )
    out = joined.where(overlap & canonical)
    if residual is not None:
        out = out.where(residual)
    drop = ["_rj_bucket", "_rj_bucket_r"]
    # `on` keys exist on both sides; keep the left copy only.
    for k in on:
        out = out.drop(rx[k])
    return out.drop(*drop)
