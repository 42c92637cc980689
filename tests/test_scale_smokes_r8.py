"""Round-8 opt-in scale probes (SPARK_GRAFT_SCALE_SMOKE=1):

1. containment_join word-mode at 50k docs with PLANTED subset partners
   (the r7c setsim discipline applied to the asymmetric operator):
   every doc is 60 unique md5 words, every 200th doc gets a partner
   holding its first 48 words — so c(partner, doc) = 48/48 = 1.0
   passes the 0.9 threshold while c(doc, partner) = 48/60 = 0.8 does
   NOT.  The expected pair set is analytic (no quadratic verifier),
   directional asymmetry is exercised, and the wall bound proves the
   prefix filter carries the join (a df blowup would take minutes).
2. bootstrap_ci structure invariance: the Poisson bootstrap needs no
   global row count, so 10x the corpus must keep every type's B
   resamples intact while narrowing the CI — the property that makes
   it THE terabyte-scale CI method.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

scale = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_SMOKE"),
    reason="opt-in: SPARK_GRAFT_SCALE_SMOKE=1 runs the round-8 scale smokes",
)

N_DOCS = 50_000
WORDS = 60
SUB_WORDS = 48  # partner keeps the first 48/60 => 0.8 reverse containment
PLANT_EVERY = 200


@pytest.mark.scale_smoke
@scale
def test_containment_join_word_mode_50k_planted_subsets(spark):
    from gtfs_realtime_etl_spark.plans.analytics14 import containment_pairs

    base = spark.range(N_DOCS)
    words = [
        F.md5(F.concat_ws(":", F.col("id"), F.lit(str(b))))
        for b in range(WORDS)
    ]
    docs = base.select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    partners = base.filter(F.col("id") % PLANT_EVERY == 0).select(
        (F.col("id") + N_DOCS).alias("doc_id"),
        F.concat_ws(" ", *words[:SUB_WORDS]).alias("text"),
    )
    corpus = docs.unionByName(partners)

    t0 = time.perf_counter()
    rows = containment_pairs(corpus, token_mode="word").collect()
    wall = time.perf_counter() - t0

    expected = {(i + N_DOCS, i) for i in range(0, N_DOCS, PLANT_EVERY)}
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == expected  # subset direction only — never the reverse
    assert all(
        (r.n_a, r.n_b, r.n_inter, r.containment_ppm)
        == (SUB_WORDS, WORDS, SUB_WORDS, 1_000_000)
        for r in rows
    )
    # ~3M token rows end-to-end at 50,250 docs: minutes would mean the
    # prefix filter stopped biting (df blowup / collision storm).
    assert wall < 180, f"containment word-mode 50k took {wall:.1f}s"


@pytest.mark.scale_smoke
@scale
def test_bootstrap_ci_structure_survives_corpus_10x(spark):
    from gtfs_realtime_etl_spark.plans.analytics16 import BOOT_B, q_bootstrap_ci

    base = q_bootstrap_ci(spark, "/root/testdata/sf0.01").collect()
    big = q_bootstrap_ci(spark, "/root/testdata/sf0.1").collect()
    for rows in (base, big):
        for r in rows:
            assert r.n_resamples == BOOT_B
            assert r.ci_lo_cents <= r.mean_cents <= r.ci_hi_cents
    width = {r.event_type: r.ci_hi_cents - r.ci_lo_cents for r in base}
    width_big = {r.event_type: r.ci_hi_cents - r.ci_lo_cents for r in big}
    # 10x the rows -> the CI must narrow for every event type (~sqrt(10)
    # in expectation; assert the direction, not the constant).
    for et, wd in width_big.items():
        assert wd < width[et], (et, wd, width[et])
