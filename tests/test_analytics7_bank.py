"""Eleventh bank (plans/analytics7.py + triangle_count in plans/graph.py):
semantic unit checks the cross-engine parity gate can't express —
skyline dominance against a brute-force reference, triangle counts on a
hand-built graph, basket pair enumeration bounds — plus the plan-shape
pins for the scale arguments each docstring makes."""

from __future__ import annotations

import contextlib
import io
import itertools
import re

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.plans.queries import QUERIES
from tests.conftest import SF_CORRECTNESS


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF_CORRECTNESS).explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# skyline_pareto
# ---------------------------------------------------------------------------


def test_skyline_matches_bruteforce_on_adversarial_points(spark):
    """Two-phase prune == quadratic dominance on a point set with every
    tie shape: duplicate points, price ties with distinct dates, date
    ties with distinct prices, and a dominated diagonal."""
    from gtfs_realtime_etl_spark.plans.analytics7 import _skyline_prune

    pts = [
        # (price, day) — day as int for easy dominance math
        (100.0, 5), (100.0, 5),     # duplicate point (both survive as one)
        (100.0, 3),                 # same price, earlier date → dominates
        (90.0, 1), (90.0, 2),       # date tie-breaker band
        (80.0, 1),                  # dominated by (90,1)
        (120.0, 9),                 # highest price, late date → frontier
        (110.0, 4), (60.0, 0),      # (60,0): earliest date → frontier
    ]
    df = spark.createDataFrame(
        [(float(p), d) for p, d in pts], "o_totalprice double, o_orderdate int"
    ).groupBy("o_totalprice", "o_orderdate").agg(F.count(F.lit(1)).alias("n"))
    got = {
        (r["o_totalprice"], r["o_orderdate"])
        for r in _skyline_prune(
            _skyline_prune(
                df.withColumn("_p", F.spark_partition_id()), "_p"
            ).drop("_p").repartition(1).withColumn("_g", F.lit(0)),
            "_g",
        ).collect()
    }
    distinct = set(pts)
    expect = {
        p
        for p in distinct
        if not any(
            q[0] >= p[0] and q[1] <= p[1] and q != p for q in distinct
        )
    }
    assert got == expect


def test_skyline_prunes_locally_before_global_single_partition(spark):
    """The global pass must see only local survivors: two window nodes,
    and the single-partition exchange feeds from a filtered window, not
    from the raw point aggregate (the scale argument of the docstring)."""
    p = plan_of(spark, "skyline_pareto")
    assert len(re.findall(r"\(\d+\) Window", p)) == 2
    assert len(re.findall(r"SinglePartition", p)) == 1


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def test_triangle_count_on_hand_built_graph(spark):
    """Degree-ordered wedge enumeration == known triangle counts:
    K4 has 4 triangles, a 4-cycle has 0, a triangle with a pendant
    vertex has 1."""
    from gtfs_realtime_etl_spark.plans import graph as g

    def count_triangles(edges):
        und = spark.createDataFrame(edges, ["lo", "hi"])
        # replicate q_triangle_count's core on a raw edge list
        deg = (
            und.select(F.col("lo").alias("node"))
            .unionAll(und.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        dl = deg.withColumnsRenamed({"node": "lo", "deg": "dlo"})
        dh = deg.withColumnsRenamed({"node": "hi", "deg": "dhi"})
        lo_first = (F.col("dlo") < F.col("dhi")) | (
            (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
        )
        oriented = (
            und.join(dl, "lo")
            .join(dh, "hi")
            .select(
                F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
                F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
                F.when(lo_first, F.col("dhi")).otherwise(F.col("dlo")).alias("dv"),
            )
        )
        e1, e2 = oriented.alias("e1"), oriented.alias("e2")
        wedge = (F.col("e1.dv") < F.col("e2.dv")) | (
            (F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v"))
        )
        return (
            e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & wedge)
            .select(F.col("e1.v").alias("v"), F.col("e2.v").alias("w"))
            .join(
                oriented.select(F.col("u").alias("v"), F.col("v").alias("w")),
                ["v", "w"],
                "left_semi",
            )
            .count()
        )

    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    assert count_triangles(k4) == 4
    assert count_triangles([(0, 1), (1, 2), (2, 3), (0, 3)]) == 0
    assert count_triangles([(0, 1), (0, 2), (1, 2), (2, 9)]) == 1
    assert g.KNN_K >= 2  # the registry graph can actually close triangles


def test_triangle_count_closes_via_semi_join_not_cartesian(spark):
    p = plan_of(spark, "triangle_count")
    assert re.search(r"SortMergeJoin.*LeftSemi|BroadcastHashJoin.*LeftSemi", p)
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# basket_rules
# ---------------------------------------------------------------------------


def test_basket_pairs_bounded_by_basket_size(spark):
    """A basket of k distinct parts yields exactly C(k,2) canonical
    ordered pairs — duplicates inside the basket collapse first."""
    from gtfs_realtime_etl_spark.plans.analytics7 import BASKET_MIN_SUPPORT

    assert BASKET_MIN_SUPPORT >= 2
    li = spark.createDataFrame(
        [(1, p) for p in (5, 3, 9, 3, 5)] + [(2, 5), (2, 3)],
        ["l_orderkey", "l_partkey"],
    )
    baskets = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.array_sort(F.collect_set(F.col("l_partkey"))).alias("ps")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda a, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda b: F.struct(a.alias("pa"), b.alias("pb")),
            ),
        )
    )
    rows = (
        baskets.select("okey", F.explode(pair_arr).alias("pr"))
        .select("okey", "pr.pa", "pr.pb")
        .collect()
    )
    got = {(r["okey"], r["pa"], r["pb"]) for r in rows}
    assert got == {(1, 3, 5), (1, 3, 9), (1, 5, 9), (2, 3, 5)}
    assert all(r["pa"] < r["pb"] for r in rows)


def test_basket_rules_single_corpus_shuffle_no_self_join(spark):
    """The plan must contain no lineitem⋈lineitem sort-merge self-join —
    pairs come from the in-row HOF explode (one Generate node)."""
    p = plan_of(spark, "basket_rules")
    assert "SortMergeJoin" not in p
    assert len(re.findall(r"\(\d+\) Generate", p)) >= 1


# ---------------------------------------------------------------------------
# phrase_search / feature_mi
# ---------------------------------------------------------------------------


def test_phrase_search_explodes_above_spreading_exchange(spark):
    """The tokenize+match projection must run AFTER the loader's
    spreading repartition (parallel), not as a filter pushed into the
    single-row-group scan task: the scan side of the plan below the
    first exchange must not contain the phrase-match transform."""
    p = plan_of(spark, "phrase_search")
    scan_blocks = p.split("Exchange")[0]
    assert "transform" not in scan_blocks
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1


def test_feature_mi_is_nonnegative_and_bounded(spark):
    """Information-theory sanity on real data: 0 ≤ MI ≤ min(H(X),H(Y))
    (up to micro-bit quantization of each log term)."""
    out = {r["pair"]: r for r in QUERIES["feature_mi"](spark, SF_CORRECTNESS).collect()}
    assert set(out) == {"priority_status", "returnflag_linestatus", "eventtype_hour"}
    for r in out.values():
        n = r["n_rows"]
        mi = r["mi_sum_micro"] / (n * 1e6)
        hx = r["log2n_micro"] / 1e6 - r["hx_sum_micro"] / (n * 1e6)
        hy = r["log2n_micro"] / 1e6 - r["hy_sum_micro"] / (n * 1e6)
        slack = 5e-5  # micro-bit quantization across ≤ 4 log terms
        assert mi >= -slack, r
        assert mi <= min(hx, hy) + slack, r
        assert hx >= -slack and hy >= -slack, r
