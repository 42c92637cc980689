"""Incremental rollup maintenance: partial states merge exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.incremental import (
    finalize,
    merge_partials,
    partial_aggregate,
)


def _facts(spark):
    rows = [(i % 4, float(i) + 0.25) for i in range(100)]
    return spark.createDataFrame(rows, "g int, v double")


def _direct(spark):
    return finalize(partial_aggregate(_facts(spark), ["g"], "v"))


def _as_map(df):
    return {
        r.g: (r.n, r.sum, r.min, r.max, r.avg) for r in df.collect()
    }


@pytest.mark.parametrize("n_splits", [2, 5])
def test_any_split_merges_to_direct_result(spark, n_splits):
    facts = _facts(spark)
    parts = [
        partial_aggregate(
            facts.filter(F.col("v").cast("int") % n_splits == i), ["g"], "v"
        )
        for i in range(n_splits)
    ]
    merged = finalize(merge_partials(parts))
    assert _as_map(merged) == _as_map(_direct(spark))


def test_merge_of_merged_state_is_stable(spark):
    """State is a monoid: merging already-merged state with a new
    partition equals one flat merge (the daily-load pattern)."""
    facts = _facts(spark)
    a = partial_aggregate(facts.filter("v < 30"), ["g"], "v")
    b = partial_aggregate(facts.filter("v >= 30 and v < 60"), ["g"], "v")
    c = partial_aggregate(facts.filter("v >= 60"), ["g"], "v")
    staged = merge_partials([merge_partials([a, b]), c])
    flat = merge_partials([a, b, c])
    assert _as_map(finalize(staged)) == _as_map(finalize(flat))


def test_schema_mismatch_raises(spark):
    facts = _facts(spark)
    a = partial_aggregate(facts, ["g"], "v")
    bad = a.withColumnRenamed("_sum", "_total")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_partials([a, bad])
