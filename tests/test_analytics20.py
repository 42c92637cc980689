"""Semantic invariants of the twenty-fourth bank (Spearman rank
correlation, gapped sequence support) — exact pure-Python replicas on
the same data, beyond the oracle-parity hash gate."""

from __future__ import annotations

import math
from collections import defaultdict

from gtfs_realtime_etl_spark.plans.analytics20 import (
    q_seq_pairs_support,
    q_spearman_corr,
)
from gtfs_realtime_etl_spark.sources.testdata import load_testdata
from tests.conftest import SF_CORRECTNESS

_NS_PER_DAY = 86_400_000_000_000
_NS_PER_HOUR = 3_600_000_000_000


def _cents(value: float) -> int:
    return int(math.floor(value * 100 + 0.5))


def _events(spark):
    return (
        load_testdata(spark, SF_CORRECTNESS, tables=("events",))["events"]
        .select("user_id", "event_id", "event_type", "ts", "value")
        .collect()
    )


def _doubled_avg_ranks(values: list[int]) -> dict[int, int]:
    """value -> doubled average rank (2*cum - c + 1) over the sorted
    multiset."""
    counts: dict = defaultdict(int)
    for v in values:
        counts[v] += 1
    out, cum = {}, 0
    for v in sorted(counts):
        c = counts[v]
        cum += c
        out[v] = 2 * cum - c + 1
    return out


def test_spearman_corr_matches_python_replica(spark):
    rows = _events(spark)
    by_type: dict = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(
            (_cents(r.value), (r.ts % _NS_PER_DAY) // _NS_PER_HOUR)
        )
    expected = {}
    for t, xys in by_type.items():
        rx = _doubled_avg_ranks([x for x, _ in xys])
        ry = _doubled_avg_ranks([y for _, y in xys])
        n = len(xys)
        srx = sum(rx[x] for x, _ in xys)
        sry = sum(ry[y] for _, y in xys)
        sxy = sum(rx[x] * ry[y] for x, y in xys)
        sxx = sum(rx[x] ** 2 for x, _ in xys)
        syy = sum(ry[y] ** 2 for _, y in xys)
        num = n * sxy - srx * sry
        dx = n * sxx - srx * srx
        dy = n * syy - sry * sry
        rho2 = (
            (1 if num >= 0 else -1) * (num * num * 1_000_000 // (dx * dy))
            if dx > 0 and dy > 0
            else None
        )
        expected[t] = (n, num, dx, dy, rho2)
        # Cross-check the signed square against float Spearman.
        if dx > 0 and dy > 0:
            rho_f = num / math.sqrt(dx * dy)
            assert abs(abs(rho_f) * rho_f - (rho2 or 0) / 1e6) < 1e-5
    got = {
        r.event_type: (r.n, r.num, r.dx, r.dy, r.rho2_signed_ppm)
        for r in q_spearman_corr(spark, SF_CORRECTNESS).collect()
    }
    assert got == expected


def test_seq_pairs_support_matches_python_replica(spark):
    rows = _events(spark)
    spans: dict = {}
    for r in rows:
        k = (r.user_id, r.event_type)
        if k not in spans:
            spans[k] = [r.ts, r.ts]
        else:
            spans[k][0] = min(spans[k][0], r.ts)
            spans[k][1] = max(spans[k][1], r.ts)
    by_user: dict = defaultdict(dict)
    for (u, t), (mn, mx) in spans.items():
        by_user[u][t] = (mn, mx)
    support: dict = defaultdict(int)
    eligible = 0
    for u, types in by_user.items():
        if len(types) >= 2:
            eligible += 1
        for a, (amin, _) in types.items():
            for b, (_, bmax) in types.items():
                if a != b and amin < bmax:
                    support[(a, b)] += 1
    expected = {
        k: (n, eligible, n * 1_000_000 // eligible)
        for k, n in support.items()
    }
    got = {
        (r.t_first, r.t_then): (r.n_users, r.n_eligible, r.support_ppm)
        for r in q_seq_pairs_support(spark, SF_CORRECTNESS).collect()
    }
    assert got == expected
    # Anti-symmetry sanity: support(a,b) + support(b,a) >= n_users(a&b
    # co-present) — at minimum every ordered pair is bounded by the
    # eligible population.
    assert all(v[0] <= v[1] for v in got.values())
