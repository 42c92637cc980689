"""Dedup + similarity operators: planted near-duplicates must be found;
LSH recall is checked against the brute-force exact baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.clusters import (
    connected_components,
    resolve_duplicates,
)
from gtfs_realtime_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
)
from gtfs_realtime_etl_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    centroids_from_labels,
    ivf_topk,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    vocab = "spark shuffle join window agg filter scan column row batch".split()
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(80)]
    rows = [(i, t) for i, t in enumerate(base)]
    # plant exact duplicates of docs 0..4 (ids 100..104)
    for i in range(5):
        rows.append((100 + i, base[i]))
    # plant near-duplicates of docs 10..14: one word changed (ids 200..204)
    for i in range(5):
        words = base[10 + i].split()
        words[5] = "mutated"
        rows.append((200 + i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_planted(corpus):
    res = exact_dedup(corpus).toPandas()
    dup_groups = res[res["n_copies"] > 1]
    assert len(dup_groups) == 5
    assert set(dup_groups["survivor_doc_id"]) == {0, 1, 2, 3, 4}


def test_minhash_lsh_finds_near_dups(corpus):
    pairs = minhash_lsh_dedup(corpus, threshold=0.5).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    # exact dups are jaccard-1.0 — must all be found
    for i in range(5):
        assert (i, 100 + i) in found
    # near-dups (1 word of 40 changed) — high jaccard, LSH should catch most
    near_hits = sum((10 + i, 200 + i) in found for i in range(5))
    assert near_hits >= 4
    assert (pairs["jaccard"] >= 0.5).all()


def test_simhash_near_dups(corpus):
    pairs = simhash_dedup(corpus, hamming_threshold=3).toPandas()
    ham = {
        (a, b): h for a, b, h in pairs[["id_a", "id_b", "hamming"]].values
    }
    for i in range(5):
        assert ham.get((i, 100 + i)) == 0  # identical text → identical simhash
    # banded-segment LSH is exact for the threshold: nothing above it leaks
    assert (pairs["hamming"] <= 3).all()


def test_simhash_bucket_cap_bounds_blowup(spark):
    """An adversarial corpus (many identical docs → one giant bucket)
    must not explode quadratically: the per-bucket cap drops oversized
    buckets entirely, so pair output is bounded by construction."""
    rows = [(i, "same text everywhere forever") for i in range(50)]
    rows += [(100 + i, f"unique document number {i} alpha beta") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = simhash_dedup(docs, hamming_threshold=3, max_bucket=10).toPandas()
    # the 50-identical-doc bucket (size 50 > cap 10) contributes nothing
    assert not ((capped["id_a"] < 100) & (capped["id_b"] < 100)).any()
    uncapped = simhash_dedup(docs, hamming_threshold=3, max_bucket=1000).toPandas()
    assert ((uncapped["id_a"] < 100) & (uncapped["id_b"] < 100)).sum() == 50 * 49 / 2


def test_connected_components_chain_and_triangle(spark):
    """A 4-node chain (transitivity across pairs) and a separate
    triangle both collapse to min-id clusters."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    comp = dict(connected_components(pairs).collect())
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_components_paths_equivalent(spark):
    """The driver union-find gate path and the distributed propagation
    path produce identical labels (driver_max_edges=0 forces the
    iterative path on the same graph)."""
    import random

    rng = random.Random(7)
    # random graph: chains, triangles, singles-by-absence, dense blobs
    edges = set()
    for base in (0, 100, 200):
        nodes = [base + i for i in range(20)]
        for _ in range(30):
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    fast = dict(connected_components(pairs).collect())
    slow = dict(connected_components(pairs, driver_max_edges=0).collect())
    assert fast == slow and len(fast) > 0


def test_components_nonconvergence_fails_loud(spark):
    """A chain longer than max_iter hops must raise (silent wrong labels
    are the failure mode at 100 TB), on the distributed path."""
    chain = [(i, i + 1) for i in range(10)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2, driver_max_edges=0)


def test_resolve_duplicates_keeps_min_id_survivors(spark, corpus):
    pairs = minhash_lsh_dedup(corpus, threshold=0.5)
    survivors = resolve_duplicates(corpus, pairs)
    ids = {r.doc_id for r in survivors.select("doc_id").collect()}
    # exact dups of 0..4 (ids 100..104) lose to their originals
    assert {0, 1, 2, 3, 4} <= ids
    assert not ids & {100, 101, 102, 103, 104}
    # untouched docs pass through: survivors + losers == corpus
    assert len(ids) == corpus.count() - (
        connected_components(pairs)
        .filter("node != cluster_id")
        .count()
    )


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    # 3 well-separated clusters + noise
    centers = rng.standard_normal((3, 64)) * 5
    rows = []
    for i in range(300):
        c = i % 3
        v = centers[c] + rng.standard_normal(64)
        rows.append((i, c, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_brute_force_topk_is_same_cluster(vectors):
    q = vectors.filter("vec_id = 0").select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    top = brute_force_topk(vectors.filter("vec_id != 0"), q, k=10).toPandas()
    assert len(top) == 10
    assert (top["label"] == 0).all()  # same cluster as query
    assert top["cosine"].is_monotonic_decreasing


def test_ivf_assignment_and_recall(vectors):
    """Cluster-generated vectors must assign back to their own cluster's
    centroid, and probing nprobe=1 cell must recover the exact top-k
    (the query's neighbors all live in its cell)."""
    cents = centroids_from_labels(vectors, label_col="label", dim=64)
    assert cents.count() == 3
    assigned = assign_cells(vectors, cents).toPandas()
    acc = (assigned["cell_id"] == assigned["label"]).mean()
    assert acc > 0.95, f"cell assignment accuracy {acc}"

    q = vectors.filter("vec_id = 0").select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    others = vectors.filter("vec_id != 0")
    exact = set(brute_force_topk(others, q, k=10).toPandas()["vec_id"])
    approx = set(
        ivf_topk(others, q, cents, k=10, nprobe=1).toPandas()["vec_id"]
    )
    assert len(exact & approx) / 10 >= 0.9


def test_lsh_recall_vs_brute_force(vectors):
    q = vectors.filter("vec_id = 0").select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    others = vectors.filter("vec_id != 0")
    exact = set(brute_force_topk(others, q, k=10).toPandas()["vec_id"])
    approx = set(
        lsh_bucketed_topk(others, q, k=10, n_planes=8, dim=64).toPandas()["vec_id"]
    )
    recall = len(exact & approx) / 10
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_ivf_at_rest_index_prunes_partitions(spark, vectors, tmp_path):
    """The at-rest IVF layout: write_ivf_index partitions the corpus by
    cell_id, and ivf_index_topk's probe must (a) prune the scan to
    exactly the nprobe probed cells' files — the scan's runtime
    numFiles metric equals the files on disk under those cells'
    directories — and (b) return the identical rows to the in-plan
    ivf_topk on the same corpus/centroids/query."""
    import os

    from gtfs_realtime_etl_spark.operators.similarity import (
        ivf_index_topk,
        select_probe_cells,
        write_ivf_index,
    )

    cents = centroids_from_labels(vectors, label_col="label", dim=64)
    others = vectors.filter("vec_id != 0")
    index = str(tmp_path / "ivf_index")
    write_ivf_index(others, cents, index)
    cell_dirs = [d for d in os.listdir(index) if d.startswith("cell_id=")]
    assert len(cell_dirs) == 3

    q = vectors.filter("vec_id = 0").select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    nprobe = 2
    # AQE wraps executed stages (the scan's runtime metrics end up
    # buried inside QueryStageExec nodes); pruning itself is plan-time
    # and AQE-independent, so turn AQE off just for the metric read.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        res = ivf_index_topk(spark, index, q, cents, k=10, nprobe=nprobe)
        explained = res._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in explained

        probed = {cell for _, cell, _ in select_probe_cells(q, cents, nprobe)}
        assert len(probed) == nprobe
        n_files_probed = sum(
            f.endswith(".parquet")
            for cell in probed
            for f in os.listdir(os.path.join(index, f"cell_id={cell}"))
        )
        out = res.toPandas()
        leaves = res._jdf.queryExecution().executedPlan().collectLeaves()
        n_files_read = sum(
            leaves.apply(i).metrics().apply("numFiles").value()
            for i in range(leaves.length())
            # the broadcast query-cells leaf (ExistingRDD): no file metric
            if leaves.apply(i).metrics().contains("numFiles")
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert n_files_read == n_files_probed  # only the probed cells' files

    expected = ivf_topk(others, q, cents, k=10, nprobe=nprobe).toPandas()
    got = out.sort_values("rank").reset_index(drop=True)
    exp = expected[got.columns].sort_values("rank").reset_index(drop=True)
    assert got["vec_id"].tolist() == exp["vec_id"].tolist()
    assert (got["cosine"] - exp["cosine"]).abs().max() < 1e-12


def test_decontamination_flags_embedded_benchmark(spark):
    """A train doc embedding a benchmark doc verbatim has containment
    1.0 and is flagged + removed; unrelated docs pass through."""
    from gtfs_realtime_etl_spark.operators.decontam import (
        contamination_pairs,
        decontaminate,
    )

    bench = "the quick brown fox jumps over the lazy dog near the river bank"
    test = spark.createDataFrame([(100, bench)], "doc_id long, text string")
    train = spark.createDataFrame(
        [
            (1, "PREFIX " + bench + " SUFFIX with trailing words"),
            (2, "completely different content about spark shuffles and joins"),
            (3, "another unrelated training document mentioning a fox once"),
        ],
        "doc_id long, text string",
    )
    pairs = contamination_pairs(train, test, shingle_k=8, containment=0.5)
    got = {(r.train_id, r.test_id): r.containment for r in pairs.collect()}
    assert set(got) == {(1, 100)}
    assert got[(1, 100)] == 1.0  # every 8-gram of the benchmark is present

    clean = decontaminate(train, test, shingle_k=8, containment=0.5)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 3]


def test_embedding_quantization_roundtrip_bounds(spark, vectors):
    """uint8 scalar quantization: codes in [0, 255], and per-dim
    reconstruction error bounded by half a quantization step."""
    from gtfs_realtime_etl_spark.operators.similarity import (
        dequantize,
        dim_min_max,
        quantize_embeddings,
    )

    mins, maxs = dim_min_max(vectors, dim=64)
    assert len(mins) == len(maxs) == 64
    assert all(m < x for m, x in zip(mins, maxs))

    q = quantize_embeddings(vectors, mins, maxs)
    rows = (
        q.withColumn("recon", dequantize(F.col("qvec"), mins, maxs))
        .select("embedding", "qvec", "recon")
        .collect()
    )
    assert rows
    for r in rows:
        assert all(0 <= v <= 255 for v in r.qvec)
        for i, (x, y) in enumerate(zip(r.embedding, r.recon)):
            half_step = (maxs[i] - mins[i]) / 255.0 / 2.0
            assert abs(x - y) <= half_step + 1e-12, (i, x, y)


def test_minhash_pair_cache_recomputes_after_block_loss(spark):
    """The cached verified-pair set must survive losing every cached
    block (the worst-case executor-loss event on a preemptible
    cluster).  persist(DISK_ONLY) keeps lineage, so a post-loss read
    recomputes instead of failing — the exact failure mode the old
    localCheckpoint cache had (truncated lineage, unrecoverable
    blocks)."""
    from pyspark import StorageLevel

    from gtfs_realtime_etl_spark.plans.queries import _minhash_verified_pairs

    pairs = _minhash_verified_pairs(spark, "/root/testdata/sf0.001")
    baseline = sorted((r.id_a, r.id_b) for r in pairs.collect())
    assert baseline
    # Simulate total block loss: unpersist drops every cached partition.
    pairs.unpersist(blocking=True)
    again = sorted((r.id_a, r.id_b) for r in pairs.collect())
    assert again == baseline
    # Restore the persisted invariant for any later consumer.
    pairs.persist(StorageLevel.DISK_ONLY)


def test_pq_full_codebook_reduces_to_exact_l2(spark):
    """PQ identity property: when the codebook contains EVERY corpus
    vector's subvectors, each vector encodes to itself (all subspace
    distances 0, ties impossible for distinct subvectors) and the ADC
    distance IS the exact squared L2 to the query — so the PQ ranking
    must equal the exact ranking bit-for-bit."""
    from gtfs_realtime_etl_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook_from_ids,
        pq_encode,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, i % 2, [float(x) for x in rng.standard_normal(16)]) for i in range(13)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    corpus = df.filter("vec_id != 0")
    codebook = pq_codebook_from_ids(corpus, list(range(1, 13)), n_subspaces=4)

    # encode: every vector's code must point at its own subvectors
    codes = {r["vec_id"]: r["pq_code"] for r in pq_encode(corpus, codebook).collect()}
    for vid, code in codes.items():
        assert code == [vid - 1] * 4, (vid, code)

    q = df.filter("vec_id = 0").select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = pq_adc_topk(corpus, q, codebook, k=5).toPandas()
    qv = np.array(rows[0][2])
    exact = sorted(
        ((float(((np.array(v) - qv) ** 2).sum()), i) for i, _, v in rows[1:]),
    )[:5]
    assert list(got["vec_id"]) == [i for _, i in exact]
    assert np.allclose(sorted(got["adc_dist"]), [d for d, _ in exact], atol=1e-9)


def test_pq_adc_partitioning_invariant(vectors):
    """The PQ ranking is a pure projection + top-k: any partition layout
    must give the identical result rows."""
    from gtfs_realtime_etl_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook_from_ids,
    )

    corpus = vectors.filter("vec_id != 0")
    codebook = pq_codebook_from_ids(corpus, list(range(1, 17)), n_subspaces=8)
    q = vectors.filter("vec_id = 0").select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    a = pq_adc_topk(corpus, q, codebook, k=10).toPandas()
    b = pq_adc_topk(corpus.repartition(7), q, codebook, k=10).toPandas()
    assert list(a["vec_id"]) == list(b["vec_id"])
    assert list(a["adc_dist"]) == list(b["adc_dist"])
    # coarse quantizer on clustered data: most ADC top-k should share
    # the query's cluster label
    assert (a["label"] == 0).mean() >= 0.7
