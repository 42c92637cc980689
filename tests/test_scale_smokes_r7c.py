"""Round-7 continuation opt-in scale probe (SPARK_GRAFT_SCALE_SMOKE=1)
for the sixteenth bank's set-similarity join.

Two smoke designs were rejected for cause, and the reasons are the
real scale lessons:

- REPLICATION smokes are the wrong tool for a similarity join: exact
  content duplication multiplies every prefix bucket's df by the
  replication factor, so candidates grow QUADRATICALLY — an
  adversarial input, not a scale model.
- CHAR-SHINGLE smokes saturate: a k-char shingle vocabulary is capped
  at alphabet^k (16^5 ~ 1M on md5-hex content), so at 50k docs every
  shingle had df ~ 60 and the candidate join exploded to ~400M rows
  regardless of filters.  Real corpora hit the same wall (26^5 ~ 12M)
  — which is why AllPairs/PPJoin systems run on WORD tokens, whose
  vocabulary grows with the corpus (Zipf) and keeps rare-first
  prefixes rare.

This smoke therefore uses ``setsim_pairs(..., token_mode="word")`` on
a fresh-content corpus generated engine-side (every document = 60
md5-hex WORDS keyed by doc id — 16^32 word space, df ~ 1 everywhere;
no driver loop, no Python generation), plants near-dup partners for
1-in-200 documents (two differing words => pair Jaccard 58/62 ~ 0.935),
and requires:

1. EXACTNESS at scale: the output is exactly the planted pair set —
   no false positives (fresh words share nothing) and, by the
   prefix-filter theorem, no false negatives.
2. The plan stays linear: 3M token rows, ~350k prefix rows, candidate
   matches ~ planted pairs only; a wall bound far below any
   quadratic's cost.

The probe also caught a third 100 TB trap in review: a forced
broadcast of the vocabulary df table (~3M distinct words here, tens of
millions in shingle mode — removed; AQE auto-broadcasts only when the
table is actually small).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

scale = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_SMOKE"),
    reason="opt-in: SPARK_GRAFT_SCALE_SMOKE=1 runs the round-7c scale smokes",
)

N_DOCS = 50_000
WORDS = 60
ALT_WORDS = 2  # partner differs in the last 2 of 60 => J = 58/62
PLANT_EVERY = 200


@pytest.mark.scale_smoke
@scale
def test_setsim_join_word_mode_50k_exact_planted_pairs(spark):
    from gtfs_realtime_etl_spark.plans.analytics12 import setsim_pairs

    base = spark.range(N_DOCS)
    words = [
        F.md5(F.concat_ws(":", F.col("id"), F.lit(str(b))))
        for b in range(WORDS)
    ]
    docs = base.select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    alt = words[: WORDS - ALT_WORDS] + [
        F.md5(F.concat_ws(":", F.col("id"), F.lit(f"alt{b}")))
        for b in range(ALT_WORDS)
    ]
    partners = base.filter(F.col("id") % PLANT_EVERY == 0).select(
        (F.col("id") + N_DOCS).alias("doc_id"),
        F.concat_ws(" ", *alt).alias("text"),
    )
    corpus = docs.unionByName(partners)

    t0 = time.perf_counter()
    rows = setsim_pairs(corpus, token_mode="word").collect()
    wall = time.perf_counter() - t0

    expected = {(i, i + N_DOCS) for i in range(0, N_DOCS, PLANT_EVERY)}
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == expected
    exp_ppm = (WORDS - ALT_WORDS) * 1_000_000 // (WORDS + ALT_WORDS)
    assert all(r.jaccard_ppm == exp_ppm for r in rows)
    assert all(
        (r.n_a, r.n_b, r.n_inter) == (WORDS, WORDS, WORDS - ALT_WORDS)
        for r in rows
    )
    # 3M token rows end-to-end at 50,200 docs: minutes would mean a
    # quadratic (a df blowup or a collision storm) sneaked back in.
    assert wall < 120, f"setsim word-mode 50k took {wall:.1f}s"
