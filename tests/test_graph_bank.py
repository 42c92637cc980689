"""Graph bank (plans/graph.py): k-NN PageRank determinism properties
and the dangling="none" fast path."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.pagerank import pagerank
from gtfs_realtime_etl_spark.plans.graph import KNN_K, _knn_edges
from gtfs_realtime_etl_spark.plans.queries import QUERIES
from gtfs_realtime_etl_spark.sources.testdata import load_testdata
from tests.conftest import SF_SMOKE


def test_dangling_none_matches_collect_when_no_dangling(spark):
    """On a graph where every node has out-edges the fast path must be
    BIT-identical to the measuring path (the measured mass is 0.0 and
    +0.0 is exact)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 2), (2, 1), (1, 3)], ["s", "d"]
    )
    a = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=8, dangling="collect").collect()
    }
    b = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=8, dangling="none").collect()
    }
    assert a == b  # exact float equality, not approx


def test_dangling_none_leaks_mass_on_dangling_graph(spark):
    """The documented failure mode: with a real dangling node the fast
    path loses mass (sum < 1) while collect conserves it — the caller's
    guarantee is load-bearing."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["s", "d"])  # 3 dangles
    keep = pagerank(edges, iterations=5, dangling="collect")
    drop = pagerank(edges, iterations=5, dangling="none")
    assert keep.agg(F.sum("rank")).collect()[0][0] == pytest.approx(1.0, abs=1e-9)
    assert drop.agg(F.sum("rank")).collect()[0][0] < 0.999


def test_dangling_invalid_mode_raises(spark):
    edges = spark.createDataFrame([(1, 2)], ["s", "d"])
    with pytest.raises(ValueError, match="dangling"):
        pagerank(edges, dangling="maybe")


def test_knn_edges_out_degree_exactly_k(spark):
    """Every node emits exactly KNN_K edges (label blocks are larger
    than K at every sf) — the no-dangling guarantee pagerank_knn relies
    on — and edges stay within label blocks."""
    emb = load_testdata(spark, SF_SMOKE, tables=("embeddings",))["embeddings"]
    edges = _knn_edges(emb)
    degs = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    assert degs.filter(F.col("deg") != KNN_K).count() == 0
    assert degs.count() == emb.count()
    lab = emb.select("vec_id", "label")
    cross = (
        edges.join(lab.withColumnRenamed("vec_id", "s").withColumnRenamed("label", "sl"), "s")
        .join(lab.withColumnRenamed("vec_id", "d").withColumnRenamed("label", "dl"), "d")
        .filter(F.col("sl") != F.col("dl"))
    )
    assert cross.count() == 0


def test_pagerank_knn_plan_no_cartesian(spark):
    """The candidate join must stay an equi-join on label with a
    residual (never a cartesian), and ranks must sum to ~1."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["pagerank_knn"](spark, SF_SMOKE).explain("formatted")
    p = buf.getvalue()
    assert not re.search(r"CartesianProduct", p)
    df = QUERIES["pagerank_knn"](spark, SF_SMOKE)
    total = df.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)
