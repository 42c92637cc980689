"""Similarity search over embedding columns (``array<float|double>``).

Two paths, mirroring what a 100 TB ANN pipeline needs:

- :func:`brute_force_topk` — the exact baseline: broadcast the query
  vectors, compute cosine with JVM higher-order functions, global top-k
  via TakeOrderedAndProject (no full sort, no Python).
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
  signs bucket both sides; only same-bucket pairs are scored.  Probes
  neighboring buckets by flipping each sign bit once (multi-probe), so
  recall degrades gracefully instead of cliff-dropping.

The hyperplanes are derived deterministically from a seed so results
are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.functions.vector import cosine_similarity, dot


def brute_force_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``query`` is expected to be small (broadcast side).  For a single
    query the plan is scan → narrow map → top-k; for q queries the cost
    is q·n dot products — use :func:`lsh_bucketed_topk` when q·n gets
    large.
    """
    passthrough = [c for c in embeddings.columns if c != vec_col]
    emb = embeddings.withColumn("_vec", F.col(vec_col).cast("array<double>"))
    q = query.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_qvec")
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        query_id_col,
        *passthrough,
        cosine_similarity(F.col("_vec"), F.col("_qvec")).alias("cosine"),
    )
    w = F.row_number().over(
        Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    )
    return scored.withColumn("rank", w).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane sign signature packed into a bigint."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        sig = sig + F.shiftleft(
            F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i
        )
    return sig


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    dim: int = 64,
    multi_probe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing an LSH bucket with
    the query (or, with multi-probe, a bucket at hamming distance 1).

    Bucket count is 2^n_planes; expected bucket size n/2^n_planes keeps
    per-bucket work tiny at scale, and the bucket join is one shuffle
    keyed on the signature.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    passthrough = [c for c in embeddings.columns if c != vec_col]
    emb = embeddings.withColumn(
        "_vec", F.col(vec_col).cast("array<double>")
    ).withColumn("bucket", lsh_signature(F.col("_vec"), planes))

    q = query.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_qvec")
    ).withColumn("qbucket", lsh_signature(F.col("_qvec"), planes))
    if multi_probe:
        # Probe the exact bucket plus every 1-bit-flip neighbor.
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(n_planes)
            ],
        )
        q = q.select(query_id_col, "_qvec", F.explode(probes).alias("qbucket"))

    scored = emb.join(
        F.broadcast(q), emb["bucket"] == q["qbucket"]
    ).select(
        query_id_col,
        *passthrough,
        cosine_similarity(F.col("_vec"), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.dropDuplicates([query_id_col, id_col])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
