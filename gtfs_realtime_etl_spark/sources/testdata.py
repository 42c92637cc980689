"""Loader for the driver-generated TPC-H-ish testdata star schema
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    if "events" in tables:
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read it as a raw nanoseconds bigint.  Queries
        # derive calendar fields with integer arithmetic (tz-free),
        # matching DuckDB's naive-timestamp semantics exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # The local testdata files are single-row-group parquet, so a scan is
    # ONE task no matter the split config.  The corpus tables feed
    # CPU-heavy per-row ops (shingling, hashing, vector math); spread
    # them across the cluster at the source boundary.  At production
    # scale inputs have many row groups and this widening is a no-op
    # cost-wise (one narrow-input shuffle of the corpus slice).
    heavy = {"documents", "embeddings"}
    parallelism = spark.sparkContext.defaultParallelism
    out = {}
    for t in tables:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        if t in heavy:
            df = df.repartition(parallelism)
        out[t] = df
    return out
