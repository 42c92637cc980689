"""Same-scale DuckDB baseline for the registry suite.

Runs every registry oracle SQL on the sf0.1 parquet through a single
DuckDB connection (all cores available) and records per-query wall
seconds — the engine-vs-engine anchor `BENCH_ANCHOR.md` reports next to
`bench.py`'s Spark numbers.  A watchdog interrupts any query after
``--timeout`` seconds (the recursive-CTE cluster oracles have aborted
past 45 minutes in earlier rounds; by default they're attempted with
the timeout rather than skipped, so the record stays honest).

Usage: python scripts/duckdb_suite_bench.py [--sf-dir DIR] [--timeout S]
Writes DUCKDB_SUITE.json and prints one summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtfs_realtime_etl_spark.plans.queries import ORACLE_SQL  # noqa: E402
from gtfs_realtime_etl_spark.testing import TABLES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--out", default="DUCKDB_SUITE.json")
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute("SET timezone = 'America/Toronto'")
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    results: dict[str, dict] = {}
    for name, sql in ORACLE_SQL.items():
        timed_out = threading.Event()

        def watchdog() -> None:
            if not done.wait(args.timeout):
                timed_out.set()
                con.interrupt()

        done = threading.Event()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.perf_counter()
        try:
            n = len(con.execute(sql).fetchall())
            results[name] = {
                "sec": round(time.perf_counter() - t0, 3),
                "rows": n,
            }
        except Exception as exc:  # interrupt lands here as an exception
            results[name] = {
                "sec": round(time.perf_counter() - t0, 3),
                "error": "timeout" if timed_out.is_set() else repr(exc)[:200],
            }
        finally:
            done.set()
            w.join()
        r = results[name]
        print(f"{name}: {r.get('sec')}s {r.get('error', '')}", flush=True)

    ok = {k: v for k, v in results.items() if "error" not in v}
    summary = {
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_ok": len(ok),
        "total_sec_ok": round(sum(v["sec"] for v in ok.values()), 1),
        "errors": {k: v["error"] for k, v in results.items() if "error" in v},
        "slowest": dict(
            sorted(((k, v["sec"]) for k, v in ok.items()),
                   key=lambda kv: -kv[1])[:8]
        ),
        "queries": {k: v["sec"] for k, v in results.items()},
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({k: summary[k] for k in
                      ("n_queries", "n_ok", "total_sec_ok", "errors",
                       "slowest")}))


if __name__ == "__main__":
    main()
