"""approx_distinct_profile has no SQL oracle (different HLL
implementations can't hash-match); its accuracy contract lives here:
every approximate count within 5% of the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.plans.queries import QUERIES
from gtfs_realtime_etl_spark.sources.testdata import load_testdata
from tests.conftest import SF_CORRECTNESS


def test_approx_distinct_within_tolerance(spark):
    got = {
        r["event_type"]: (r["approx_users"], r["approx_values"])
        for r in QUERIES["approx_distinct_profile"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    events = load_testdata(spark, SF_CORRECTNESS, tables=("events",))["events"]
    exact = {
        r["event_type"]: (r["u"], r["v"])
        for r in events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("u"),
            F.count_distinct("value").alias("v"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for et, (au, av) in got.items():
        eu, ev = exact[et]
        assert abs(au - eu) / eu <= 0.05, (et, au, eu)
        assert abs(av - ev) / ev <= 0.05, (et, av, ev)
