"""merge_upsert (CDC latest-wins merge) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.cdc import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], "k int, v string, ver int"
    )


def test_upsert_insert_update_delete(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [
            (2, "b2", 1, False),   # update
            (4, "d", 1, False),    # insert
            (3, "c", 1, True),     # delete (tombstone)
        ],
        "k int, v string, ver int, is_del boolean",
    )
    out = merge_upsert(base, updates, keys=["k"], version_col="ver",
                       delete_col="is_del")
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: "a", 2: "b2", 4: "d"}
    assert out.columns == base.columns


def test_version_tie_update_wins(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [(1, "a-new", 0, False)], "k int, v string, ver int, is_del boolean"
    )
    out = merge_upsert(base, updates, keys=["k"], version_col="ver",
                       delete_col="is_del")
    assert {r.v for r in out.filter(F.col("k") == 1).collect()} == {"a-new"}


def test_stale_update_loses(spark):
    base = _base(spark).withColumn("ver", F.lit(5))
    updates = spark.createDataFrame(
        [(1, "old", 3, False)], "k int, v string, ver int, is_del boolean"
    )
    out = merge_upsert(base, updates, keys=["k"], version_col="ver",
                       delete_col="is_del")
    assert {r.v for r in out.filter(F.col("k") == 1).collect()} == {"a"}


def test_single_shuffle_plan(spark):
    """The merge is union + ONE exchange on the key — never a join."""
    import contextlib
    import io

    base = _base(spark)
    updates = spark.createDataFrame(
        [(2, "b2", 1, False)], "k int, v string, ver int, is_del boolean"
    )
    out = merge_upsert(base, updates, keys=["k"], version_col="ver",
                       delete_col="is_del")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert "Join" not in tree, tree
    assert tree.count("Exchange") == 1, tree


def test_schema_mismatch_raises(spark):
    base = _base(spark)
    bad = spark.createDataFrame([(1, 0)], "k int, ver int")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(base, bad, keys=["k"], version_col="ver")
