"""Every registry query must exactly match its DuckDB oracle — the
local replica of the driver's CORRECTNESS gate (sf0.01)."""

from __future__ import annotations

import pytest

from gtfs_realtime_etl_spark.plans.queries import ORACLE_SQL, QUERIES
from gtfs_realtime_etl_spark.testing import compare_to_oracle
from tests.conftest import SF_CORRECTNESS


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n in ORACLE_SQL))
def test_oracle_parity(spark, name):
    res = compare_to_oracle(spark, name, SF_CORRECTNESS)
    assert res.spark_rows > 0, f"{name}: empty result"
    assert res.ok, f"{name}: {res.notes} (rows spark={res.spark_rows} oracle={res.oracle_rows}, max|Δ|={res.max_abs_delta})"


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in ORACLE_SQL))
def test_rows_only_queries(spark, name):
    """Engine-native queries (no SQL oracle): non-empty + stable schema."""
    df = QUERIES[name](spark, SF_CORRECTNESS)
    assert df.count() > 0, f"{name}: empty result"
    assert len(df.columns) >= 2
