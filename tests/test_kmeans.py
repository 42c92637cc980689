"""k-means coarse quantizer: Lloyd's improves the clustering objective
and the fitted table plugs into the IVF consumers unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.kmeans import (
    kmeans_assignments,
    kmeans_fit,
)
from gtfs_realtime_etl_spark.operators.similarity import _l2sq, ivf_topk


def _cost(spark, emb, cents) -> float:
    """Total within-cluster squared distance under a centroid list."""
    cent_df = spark.createDataFrame(
        [(c["cell_id"], c["centroid"]) for c in cents],
        "cell_id int, centroid array<double>",
    )
    assigned = kmeans_assignments(emb, cents)
    return (
        assigned.join(
            emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
            "vec_id",
        )
        .join(F.broadcast(cent_df), "cell_id")
        .select(_l2sq(F.col("v"), F.col("centroid")).alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )


def test_kmeans_improves_objective_and_partitions_totally(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    init = kmeans_fit(emb, k=8, iterations=0)
    fit = kmeans_fit(emb, k=8, iterations=3)
    # Lloyd's is (quantization-tolerant) non-increasing in the objective
    assert _cost(spark, emb, fit) <= _cost(spark, emb, init) + 1e-6
    # total assignment: every vector lands in exactly one cell
    counts = kmeans_assignments(emb, fit).groupBy("cell_id").count().collect()
    assert sum(r["count"] for r in counts) == n
    assert len(counts) <= 8


def test_kmeans_empty_cell_carries_previous_centroid(spark):
    """Round-12 chained-rounds pin: a cell that captures no vectors
    must carry its previous centroid through every round (the
    try_element_at/coalesce path — ANSI element_at on the update map
    would throw).  Two identical init vectors force the argmin tie to
    the smaller cell id, leaving the duplicate cell empty forever."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),  # duplicate of id 0 -> cell 1 goes empty
        (2, [10.0, 10.0]),
        (3, [0.25, 0.25]),
        (4, [10.25, 10.25]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fit = kmeans_fit(emb, k=3, iterations=2, scale=8)
    assert [c["cell_id"] for c in fit] == [0, 1, 2]
    # cell 1 kept its init centroid bit-for-bit
    assert fit[1]["centroid"] == [0.0, 0.0]
    # the non-empty cells moved to their member means
    assert fit[0]["centroid"] != [0.0, 0.0]
    # assignment under the fitted table still covers every vector
    counts = {
        r["cell_id"]: r["n"]
        for r in kmeans_assignments(emb, fit)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(counts.values()) == len(rows)


def test_kmeans_centroids_feed_ivf_topk(spark):
    """The fitted list is drop-in for ivf_topk (same collected form as
    centroids_from_labels): probing returns exactly k hits per query."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(emb, k=8, iterations=2)
    q = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    out = ivf_topk(emb, q, cents, k=5, nprobe=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(len(v) for v in per_q.values()) == {5}
    # a query vector present in the corpus must find itself first
    for qid, rows in per_q.items():
        best = max(rows, key=lambda r: r["cosine"])
        assert best["vec_id"] == qid
