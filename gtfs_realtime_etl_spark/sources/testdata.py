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
    return {
        t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) for t in tables
    }
