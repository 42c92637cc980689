"""snapshot_diff operator semantics on a micro fixture.

The cross-engine hash gate (test_oracle_parity: snapshot_diff) proves
Spark == DuckDB on the orders-derived snapshot pair; this pins the
row-level classification itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.diff import row_hash60, snapshot_diff


def test_snapshot_diff_classifies_all_four_ways(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)],
        "k long, status string, amt double",
    )
    new = spark.createDataFrame(
        [(1, "A", 10.0), (2, "X", 20.0), (4, "D", 40.0)],
        "k long, status string, amt double",
    )
    canonical = F.concat_ws(
        "|", "k", "status", F.round(F.col("amt") * 100).cast("long")
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, "k", canonical).collect()
    }
    assert got == {1: "unchanged", 2: "modified", 3: "deleted", 4: "added"}


def test_row_hash60_is_stable_and_column_sensitive(spark):
    df = spark.createDataFrame([("a|1",), ("a|2",)], "s string")
    h = [r.h for r in df.select(row_hash60(F.col("s")).alias("h")).collect()]
    assert h[0] != h[1]
    assert all(0 <= x < (1 << 60) for x in h)
    # repeatable across plans
    h2 = [r.h for r in df.select(row_hash60(F.col("s")).alias("h")).collect()]
    assert h == h2
