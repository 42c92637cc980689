"""Plan-shape guards for the TPC-H classics bank (plans/classics.py):
the decorrelated subqueries must actually plan as broadcasts, the
semi/anti pair must keep its join strategies, and the global top-N
must be TakeOrderedAndProject — the properties that make these shapes
survive a 100 TB fact table.
"""

from __future__ import annotations

import contextlib
import io
import re

from gtfs_realtime_etl_spark.plans.queries import QUERIES
from tests.conftest import FULL_SUITE, SF_CORRECTNESS


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF_CORRECTNESS).explain("formatted")
    return buf.getvalue()


def count(plan: str, pattern: str) -> int:
    return len(re.findall(pattern, plan))


def test_min_cost_supplier_broadcasts_decorrelated_min(spark):
    """Q2 shape: the per-part MIN aggregate and both dimension joins
    must be broadcast — the fact table is never on the build side and
    never re-scanned per row (no nested-loop / cartesian)."""
    p = plan_of(spark, "min_cost_supplier")
    assert count(p, r"BroadcastHashJoin") >= 3
    assert count(p, r"CartesianProduct|BroadcastNestedLoopJoin") == 0


def test_large_orders_is_take_ordered(spark):
    """Q18 shape: the final ORDER BY + LIMIT 100 must plan as
    TakeOrderedAndProject (per-partition top-k + k-list merge), never a
    global sort."""
    p = plan_of(spark, "large_orders")
    # formatted-explain lists operators in both the tree and the
    # numbered detail section, so assert presence + no global Sort.
    assert count(p, r"TakeOrderedAndProject") >= 1
    assert count(p, r"\(\d+\) Sort\b") == 0
    # The HAVING survivor set joins broadcast into orders + customer.
    assert count(p, r"BroadcastHashJoin") >= 2


def test_waiting_supplier_semi_anti_shapes(spark):
    """Q21 shape: EXISTS plans as LeftSemi, NOT EXISTS as LeftAnti,
    with no cartesian fallback; the supplier name join is broadcast."""
    p = plan_of(spark, "waiting_supplier")
    assert count(p, r"LeftSemi") >= 1
    assert count(p, r"LeftAnti") >= 1
    assert count(p, r"CartesianProduct|BroadcastNestedLoopJoin") == 0


def test_idle_customers_anti_join_and_scalar_broadcast(spark):
    """Q22 shape: the scalar average is a 1-row broadcast (nested-loop
    broadcast is FINE for a scalar — that's how Spark plans a scalar
    crossJoin) and the no-recent-orders check is a LeftAnti."""
    p = plan_of(spark, "idle_customers")
    assert count(p, r"LeftAnti") >= 1
    assert count(p, r"CartesianProduct") == 0


def test_promo_share_single_fact_scan(spark):
    """Q14 shape: the conditional-aggregate ratio reads lineitem ONCE
    (one scan of lineitem.parquet in the whole plan) and pushes the
    shipdate bounds into it."""
    p = plan_of(spark, "promo_share")
    assert count(p, r"lineitem\.parquet") == 1
    assert "PushedFilters" in p
    (li_scan,) = [
        l for l in p.splitlines() if "PushedFilters" in l and "GreaterThanOrEqual" in l
    ]
    assert "l_shipdate" in li_scan


def test_small_qty_revenue_broadcasts_avg(spark):
    """Q17 shape: the per-part AVG joins back via broadcast, and the
    only exchanges are the aggregate's own partials (no fact-fact
    shuffle join)."""
    p = plan_of(spark, "small_qty_revenue")
    assert count(p, r"BroadcastHashJoin") >= 2
    assert count(p, r"SortMergeJoin") == 0


def test_scd2_single_partitioning_for_both_windows(spark):
    """Both windows (lag for change detection, lead for validity end)
    partition on user_id with the same (ts, event_id) order — Spark
    must plan ONE user_id exchange, not two."""
    p = plan_of(spark, "scd2_intervals")
    assert count(p, r"\(\d+\) Exchange") <= 2  # window shuffle + final agg
    assert count(p, r"hashpartitioning\(user_id", ) >= 1


def test_fk_integrity_dimension_antijoins_broadcast(spark):
    """The three dimension-side orphan checks must be broadcast anti
    joins; only lineitem->orders may shuffle (fact vs fact)."""
    p = plan_of(spark, "fk_integrity")
    assert count(p, r"BroadcastHashJoin LeftAnti") >= 3
    assert count(p, r"CartesianProduct|BroadcastNestedLoopJoin") == 0


def test_period_reconciliation_full_outer_smj_reuses_partitioning(spark):
    """Full outer cannot broadcast; it must be a sort-merge join whose
    inputs are the two custkey-partitioned aggregates — no EXTRA
    exchange between aggregate and join (same key domain)."""
    p = plan_of(spark, "period_reconciliation")
    assert count(p, r"SortMergeJoin FullOuter") >= 1
    assert count(p, r"BroadcastHashJoin FullOuter") == 0


def test_no_cartesian_anywhere_in_registry(spark):
    """Registry-wide plan hygiene: NO query may plan a CartesianProduct,
    and BroadcastNestedLoopJoin is allowed only where the build side is
    a 1-row scalar aggregate (the crossJoin-a-scalar pattern) or a
    bounded probe batch (ann_cosine_topk / hard_negatives: tens of
    query vectors broadcast against one scan) — listed explicitly so a
    new accidental NLJ fails loudly."""
    SCALAR_BNLJ_OK = {
        "ann_cosine_topk",   # probe vector broadcast
        "ann_ivf_topk",      # probe vector broadcast
        "funnel_conversion", # stage totals scalar
        "event_rate_anomaly",# global mean/std scalar
        "group_split",       # leak-audit scalar
        "idle_customers",    # Q22 average-balance scalar
        "important_parts",   # Q11 global-mean scalar
        "small_qty_revenue", # Q17 falls back if stats shift
        "top_supplier",      # Q15 max-revenue scalar
        "semantic_decontam", # benchmark-set scalar
        "quality_resample",  # keep-rate scalar
        "table_profile",     # per-column scalar assembly
        "vocab_coverage",    # vocab-size scalar
        "mixture_sample",    # per-source weight scalar
        "decontamination",   # benchmark scalar
        "promo_share",       # single-row ratio output
        "period_reconciliation",  # segment scalar guards
        "bigram_lm_score",   # vocab-size 1-row scalar broadcast (plans/analytics3.py)
        "token_pmi",         # corpus-totals 1-row scalar broadcast (plans/analytics4.py)
        "hard_negatives",    # bounded 64-anchor probe-batch broadcast (plans/analytics4.py)
        "heavy_hitters",     # sketch D/N 1-row scalar broadcast (plans/analytics5.py)
        "rrf_fusion",        # probe vector broadcast (plans/analytics5.py)
        "ann_recall_report", # probe vector broadcasts via the three ANN rankers
        "k_anonymity",       # table-total 1-row scalar broadcast (plans/analytics6.py)
        "flagship_incremental",  # max-day 1-row scalar broadcast (plans/analytics22.py)
        "bm25_topk",         # corpus N/avgdl 1-row scalar broadcast (plans/analytics6.py)
        "key_skew_report",   # moment/top10 1-row scalar assembly (plans/analytics6.py)
        "join_cardinality",  # exact/estimate 1-row scalar assembly (plans/analytics6.py)
        "feature_mi",        # MI/entropy 1-row scalar combines (plans/analytics7.py)
        "basket_rules",      # n_orders 1-row scalar broadcast (plans/analytics7.py)
        "ndcg_report",       # DCG×IDCG 1-row scalar combine + probe vector broadcasts (plans/analytics11.py)
        "naive_bayes_lang",  # 5-row language-dim broadcast + vocab/doc-total 1-row scalars (plans/analytics12.py)
        "quantile_normalization",  # 101-point percentile-grid 1-row scalar broadcast (plans/analytics13.py)
        "cuped_adjustment",   # cut-timestamp + moments 1-row scalar broadcasts (plans/analytics14.py)
        "conformal_intervals",  # fit/qhat/offset 1-row scalar broadcasts + <=202-row rank probe (plans/analytics14.py)
        "decayed_topk",       # corpus-max-timestamp 1-row scalar broadcast (plans/analytics14.py)
        "apriori_triples",    # n_orders 1-row scalar broadcast (plans/analytics17.py)
        "did_estimator",      # corpus-midpoint cut 1-row scalar broadcast (plans/analytics17.py)
        "js_divergence",      # corpus-midpoint cut 1-row scalar broadcast (plans/analytics18.py)
        "degree_assortativity",  # n_nodes 1-row scalar broadcast (plans/analytics19.py)
        "seq_pairs_support",  # n_eligible 1-row scalar broadcast (plans/analytics20.py)
    }
    # Lane budget (round-13): building all 202 frames runs every staged
    # write / driver collect at sf0.01 — 86 s in the default-lane
    # --durations.  Default lane sweeps the same deterministic 1-in-3
    # sample as test_oracle_parity; SPARK_GRAFT_FULL_SUITE=1 sweeps all.
    names = sorted(QUERIES)
    if not FULL_SUITE:
        names = names[::3]
    for name in names:
        fn = QUERIES[name]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_CORRECTNESS).explain("formatted")
        p = buf.getvalue()
        assert count(p, r"\(\d+\) CartesianProduct") == 0, name
        if name not in SCALAR_BNLJ_OK:
            assert count(p, r"\(\d+\) BroadcastNestedLoopJoin") == 0, name
