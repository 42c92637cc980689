"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation of
every output column, no driver materialization cost)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from gtfs_realtime_etl_spark.plans.queries import QUERIES
from gtfs_realtime_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (codegen, parquet reader paths) outside the timings.
    QUERIES["filter_scan"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Warm the Python worker pool too: each executor thread spawns its
    # pandas/pyarrow worker lazily on first Arrow-UDF use, which would
    # otherwise bill ~5-8 s of interpreter startup to whichever kernel
    # query runs first (environment init, not query work — same rationale
    # as the JVM warmup above).
    @F.pandas_udf(LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x

    par = spark.sparkContext.defaultParallelism
    spark.range(0, par * 4, 1, par).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    # Warm every base-table scan (parquet footers, page cache, the
    # events-ts normalization path) so first-table-touch cost doesn't
    # bill to whichever query happens to sit at the front of the
    # registry order (the driver-gate ordering rotates new entries to
    # the front each round, which previously inflated their medians by
    # multiple seconds of environment init).
    from gtfs_realtime_etl_spark.sources.testdata import TABLES, load_testdata

    for _t, _df in load_testdata(spark, sf_dir, tables=TABLES).items():
        _df.write.format("noop").mode("overwrite").save()

    # n runs per query (default 4, override SPARK_GRAFT_BENCH_RUNS):
    # this box shows intermittent multi-second background stalls
    # (documented in BENCH_ANCHOR.md) that would otherwise land on one
    # random query per run.  Three totals keep the report honest:
    # - single_pass_total: first pass, cold (includes any first-use
    #   materialization) — the upper bound a fresh session pays;
    # - median_total: per-query median of n runs — the steady-state
    #   figure robust to box stalls (the headline "value");
    # - best_total: per-query best of n — the variance floor.
    import statistics

    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4")), 1)
    best: dict[str, float] = {}
    med: dict[str, float] = {}
    first_pass: dict[str, float] = {}
    for name, fn in QUERIES.items():
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        first_pass[name] = round(times[0], 3)
        best[name] = round(min(times), 3)
        med[name] = round(statistics.median(times), 3)

    # Full per-query detail goes to BENCH_FULL.json; the stdout line must
    # stay compact because the bench runner captures only a ~2 KB tail of
    # stdout and parses the JSON out of it (a 101-query inline dict made
    # rounds 3-5 unparseable).
    totals = {
        "median_total": round(sum(med.values()), 3),
        "best_total": round(sum(best.values()), 3),
        "single_pass_total": round(sum(first_pass.values()), 3),
    }
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(
            {
                "median": med,
                "best": best,
                "single_pass": first_pass,
                "sf": sf,
                "n_runs": n_runs,
                **totals,
            },
            f,
            indent=1,
        )

    payload = {
        "metric": (
            f"registry-suite wall time over {len(med)} queries (sum of "
            f"per-query median of {n_runs} runs, noop sink; per-query "
            f"detail in BENCH_FULL.json)"
        ),
        "value": totals["median_total"],
        "unit": "sec",
        "sf": sf,
        "n_runs": n_runs,
        **totals,
        "queries_total": len(med),
        "queries": {},
    }
    # Inline the flagship plus the slowest queries, up to a char budget.
    order = [q for q in ("flagship_punctuality",) if q in med]
    order += sorted((q for q in med if q not in order), key=med.get, reverse=True)
    sel: dict[str, float] = {}
    for name in order:
        sel[name] = med[name]
        trial = dict(payload, queries=sel, queries_reported=len(sel))
        if len(json.dumps(trial, separators=(",", ":"))) > 1500:
            del sel[name]
            break
    payload["queries"] = sel
    payload["queries_reported"] = len(sel)
    print(json.dumps(payload, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
