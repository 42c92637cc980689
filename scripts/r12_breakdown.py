"""Round-12 build-vs-action breakdown probe.

For each named registry query, times (bench methodology: GC+drain+GC
outside the window, noop sink) the two phases the bench's single timed
window contains:

- build(s): ``fn(spark, sf_dir)`` returning the DataFrame — plan
  construction, py4j traffic, and any EAGER work the query does while
  building (staged parquet writes, driver-loop collects);
- action(s): the noop write of the returned frame.

Optionally cProfiles the build phase (--profile) to attribute build
time between py4j command round-trips and eager Spark jobs.

Usage:
    python scripts/r12_breakdown.py q1 q2 ...
    python scripts/r12_breakdown.py --profile q1
"""

from __future__ import annotations

import cProfile
import os
import pstats
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    profile = False
    names = []
    for a in args:
        if a == "--profile":
            profile = True
        else:
            names.append(a)
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))

    import bench
    from gtfs_realtime_etl_spark.plans.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench._build_session(sf_dir)

    def _gc_drain():
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        spark.sparkContext._jvm.System.gc()

    for name in names:
        fn = QUERIES[name]
        builds, actions = [], []
        for r in range(n_runs):
            _gc_drain()
            spark.sparkContext.setJobDescription(f"r12breakdown:{name}")
            t0 = time.perf_counter()
            if profile and r == n_runs - 1:
                pr = cProfile.Profile()
                pr.enable()
                df = fn(spark, sf_dir)
                pr.disable()
            else:
                df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            builds.append(t1 - t0)
            actions.append(t2 - t1)
        print(
            f"{name} build={[round(t, 2) for t in builds]} "
            f"med_build={statistics.median(builds):.2f} "
            f"action={[round(t, 2) for t in actions]} "
            f"med_action={statistics.median(actions):.2f}",
            flush=True,
        )
        if profile:
            st = pstats.Stats(pr)
            st.sort_stats("cumulative")
            print(f"--- cProfile (build, last run) for {name} ---")
            st.print_stats(25)
    spark.stop()


if __name__ == "__main__":
    main()
