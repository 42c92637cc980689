"""Shared test fixtures: one SparkSession per test session.

Lane contract (round-13): the DEFAULT ``pytest tests/`` pass must fit
the driver's verification window (~15 min — round 12's 55-min suite
truncated driver-side at 46% and left the test gate unverifiable), so
the handful of multi-minute tests are gated behind
``SPARK_GRAFT_FULL_SUITE=1`` (the builder's once-per-round lane, which
also widens the oracle-parity sample back to all 202 queries).  Every
module still runs in the default lane; only individually-measured
outliers (>25 s in tests' --durations) moved to the full lane."""

from __future__ import annotations

import os

import pytest

from gtfs_realtime_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"

FULL_SUITE = bool(os.environ.get("SPARK_GRAFT_FULL_SUITE"))

#: Gate for individually slow tests (multi-minute e2e / exhaustive
#: sweeps): default lane skips them, SPARK_GRAFT_FULL_SUITE=1 runs them.
full_suite_only = pytest.mark.skipif(
    not FULL_SUITE,
    reason="full-suite lane: set SPARK_GRAFT_FULL_SUITE=1 (builder runs once per round)",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()
