"""Round-13 interleaved A/B probe (VERDICT item 4): phase-robust
confirm-or-revert for the two round-12 changes the round-end suite
could not certify (degree_assortativity, embedding_pc1).

Variants run ALTERNATED run-for-run in one session (bench methodology:
GC+drain+GC outside the window, noop sink), so box-phase drift hits
every variant equally.  OLD variants are the pre-round-12 forms
(commit b5c72d5^), inlined verbatim; MID variants isolate which half
of a two-part change carries the cost.

Usage:
    python scripts/r13_ab.py assort pc1
    SPARK_GRAFT_AB_ROUNDS=6 python scripts/r13_ab.py assort
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


# --- degree_assortativity variants -----------------------------------------


def _assort_edges(spark, sf_dir):
    from gtfs_realtime_etl_spark.plans.analytics19 import ASSORT_BASKET_CAP, _t

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    baskets = items.groupBy("l_orderkey").agg(
        F.expr(
            f"slice(array_sort(collect_set(l_partkey)), 1, {ASSORT_BASKET_CAP})"
        ).alias("parts")
    ).filter(F.size("parts") >= 2)
    return (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (a, i) ->"
                    " transform(slice(parts, i + 2, size(parts)), b ->"
                    " struct(a AS u, b AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )


def _assort_report_old(edges: DataFrame) -> DataFrame:
    """Pre-round-12 report: two-scan unionAll degree (b5c72d5^)."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    both = (
        edges.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"),
            "v",
        )
    )
    mom = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.expr("du + dv")).cast("long").alias("sx"),
        F.sum(
            F.expr("2 * CAST(du AS DECIMAL(38,0)) * CAST(dv AS DECIMAL(38,0))")
        ).alias("sxy"),
        F.sum(
            F.expr(
                "CAST(du AS DECIMAL(38,0)) * CAST(du AS DECIMAL(38,0))"
                " + CAST(dv AS DECIMAL(38,0)) * CAST(dv AS DECIMAL(38,0))"
            )
        ).alias("sxx"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return mom.crossJoin(F.broadcast(n_nodes)).select(
        "n_nodes",
        "n_edges",
        F.expr("2 * n_edges").cast("long").alias("m_terms"),
        F.col("sx").alias("sx"),
        F.col("sxy").cast("long").alias("sxy"),
        F.col("sxx").cast("long").alias("sxx"),
        F.expr(
            "CAST(2 * CAST(n_edges AS DECIMAL(38,0)) * sxy"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("num"),
        F.expr(
            "CAST(2 * CAST(n_edges AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("den"),
        F.expr(
            "CASE WHEN (2 * CAST(n_edges AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)))"
            " > 0 THEN"
            " CAST((2 * CAST(n_edges AS DECIMAL(38,0)) * sxy"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)))"
            " * 1000000"
            " div (2 * CAST(n_edges AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)))"
            " AS BIGINT) END"
        ).alias("r_ppm"),
    )


def assort_new(spark, sf_dir):
    from gtfs_realtime_etl_spark.plans.analytics19 import q_degree_assortativity

    return q_degree_assortativity(spark, sf_dir)


def assort_old(spark, sf_dir):
    return _assort_report_old(_assort_edges(spark, sf_dir))


def assort_mid(spark, sf_dir):
    """Current report (explode degree) over UNSTAGED edges — isolates
    the staging write from the single-scan degree."""
    from gtfs_realtime_etl_spark.plans.analytics19 import assortativity_report

    return assortativity_report(_assort_edges(spark, sf_dir))


# --- embedding_pc1 variants -------------------------------------------------


def pc1_new(spark, sf_dir):
    from gtfs_realtime_etl_spark.plans.analytics4 import q_embedding_pc1

    return q_embedding_pc1(spark, sf_dir)


def pc1_old(spark, sf_dir):
    """Pre-round-12 driver loop: collect v after every round (b5c72d5^)."""
    from gtfs_realtime_etl_spark.plans.analytics4 import (
        PC1_ITERS,
        PC1_ROUND,
        _PC1_DEC,
        q_embedding_covariance,
    )

    tri_rows = (
        q_embedding_covariance(spark, sf_dir)
        .select("i", "j", F.col("cov").alias("c"))
        .collect()
    )
    d = max(r["i"] for r in tri_rows)
    mat: dict[int, list[float]] = {i: [0.0] * d for i in range(1, d + 1)}
    for r in tri_rows:
        mat[r["i"]][r["j"] - 1] = r["c"]
        mat[r["j"]][r["i"] - 1] = r["c"]
    crow_lit = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(x)!r}D" for x in mat[i]) + ")"
            for i in range(1, d + 1)
        )
        + ")"
    )
    base = (
        spark.range(1, d + 1)
        .coalesce(1)
        .select(
            F.col("id").cast("int").alias("dim"),
            F.element_at(crow_lit, F.col("id").cast("int")).alias("crow"),
        )
        .localCheckpoint(eager=True)
    )
    v = [0.125] * d
    eig = None
    elem_dec = "decimal(25,12)"
    acc_dec = "decimal(37,12)"
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    for _ in range(PC1_ITERS):
        vlit = F.expr("array(" + ", ".join(f"{float(x)!r}D" for x in v) + ")")
        w = F.aggregate(
            F.zip_with(F.col("crow"), vlit, lambda c, x: (c * x).cast(elem_dec)),
            F.lit(0).cast(acc_dec),
            lambda acc, t: (acc + t).cast(acc_dec),
        ).cast("double")
        wdf = base.select("dim", w.alias("w"))
        out = wdf.select(
            "dim",
            (F.round((F.col("w")
                / F.sqrt(
                    F.sum((F.col("w") * F.col("w")).cast(_PC1_DEC))
                    .over(wall)
                    .cast("double")
                )) * F.lit(float(10 ** PC1_ROUND)), 0) / F.lit(float(10 ** PC1_ROUND))).alias("v"),
            F.sqrt(
                F.sum((F.col("w") * F.col("w")).cast(_PC1_DEC))
                .over(wall)
                .cast("double")
            ).alias("nrm"),
        ).collect()
        v = [r["v"] for r in sorted(out, key=lambda r: r["dim"])]
        eig = out[0]["nrm"]
    vlit = F.expr("array(" + ", ".join(f"{float(x)!r}D" for x in v) + ")")
    return (
        spark.range(1, d + 1)
        .coalesce(1)
        .select(
            F.col("id").cast("int").alias("dim"),
            F.element_at(vlit, F.col("id").cast("int")).alias("v"),
            (F.round((F.lit(float(eig))) * F.lit(1e6), 0) / F.lit(1e6)).alias("eig"),
        )
    )


GROUPS = {
    "assort": [("new", assort_new), ("mid", assort_mid), ("old", assort_old)],
    "pc1": [("new", pc1_new), ("old", pc1_old)],
}


def main() -> None:
    names = sys.argv[1:] or list(GROUPS)
    n_rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "5"))

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench._build_session(sf_dir)

    def _gc_drain():
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        spark.sparkContext._jvm.System.gc()

    for gname in names:
        variants = GROUPS[gname]
        if os.environ.get("SPARK_GRAFT_AB_REVERSE"):
            variants = list(reversed(variants))
        times: dict[str, list[float]] = {v: [] for v, _ in variants}
        # one untimed warm run of each variant (first-touch costs)
        for vname, fn in variants:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for r in range(n_rounds):
            for vname, fn in variants:
                _gc_drain()
                spark.sparkContext.setJobDescription(f"r13ab:{gname}:{vname}:{r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[vname].append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
        for vname, _ in variants:
            ts = times[vname]
            print(
                f"{gname}:{vname} runs={[round(t, 2) for t in ts]} "
                f"med={statistics.median(ts):.2f} best={min(ts):.2f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
