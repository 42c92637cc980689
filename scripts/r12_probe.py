"""Round-12 isolated per-query probe: bench-methodology timings plus
``explain("formatted")`` capture for the optimization round.

Usage:
    python scripts/r12_probe.py q1 q2 ...            # time queries
    python scripts/r12_probe.py --explain-dir plans/r12 --suffix before q1 ...

Method matches bench.py exactly (same session factory, same warmups,
noop sink, GC+drain+GC before every timed run) so numbers are
comparable to BENCH_FULL.json medians; runs are isolated per
invocation so no suite-position effects.  Output: one line per query
``name runs=[..] med=.. best=..`` plus optional plan files
``<dir>/<name>_<suffix>.txt``.
"""

from __future__ import annotations

import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    suffix = "before"
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "4"))
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--explain-dir":
            explain_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

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
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        times = []
        for _ in range(n_runs):
            _gc_drain()
            spark.sparkContext.setJobDescription(f"r12probe:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name} runs={[round(t, 2) for t in times]} "
            f"med={statistics.median(times):.2f} best={min(times):.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
