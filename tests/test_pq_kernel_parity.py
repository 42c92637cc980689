"""Pin pq_adc_topk's two scoring paths bit-for-bit equal.

``use_kernel=True`` (the default since round 8 — a vectorized numpy
``mapInPandas`` kernel) and ``use_kernel=False`` (the pure-Column twin
that anchors the DuckDB oracle) promise the same seeded-left-fold IEEE
op order, the same argmin tie-breaks (lowest codeword index), and the
same rank tie-breaks.  The round-8 verdict flagged that the kernel
became the default AFTER the entry's last driver row verified the
Column path, with no parity pin in the tree — this is that pin, on the
exact registry shape (ann_pq_topk's codebook build, query row, and
top-k) at the correctness scale factor.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.similarity import (
    pq_adc_topk,
    pq_codebook_from_ids,
)
from gtfs_realtime_etl_spark.plans.analytics5 import (
    PQ_CODEBOOK_IDS,
    PQ_M,
)
from gtfs_realtime_etl_spark.sources.testdata import load_testdata
from tests.conftest import SF_CORRECTNESS

TOP_K = 25  # > the registry's k so rank-tail ties are exercised too


def _run(spark, use_kernel: bool):
    embeddings = load_testdata(
        spark, SF_CORRECTNESS, tables=("embeddings",)
    )["embeddings"]
    codebook = pq_codebook_from_ids(
        embeddings, list(PQ_CODEBOOK_IDS), PQ_M
    )
    q = embeddings.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = pq_adc_topk(
        embeddings.filter("vec_id != 0"),
        q,
        codebook,
        k=TOP_K,
        use_kernel=use_kernel,
    )
    return [
        (r.query_id, r.vec_id, r.label, r.adc_dist, r.rank)
        for r in res.orderBy("query_id", "rank").collect()
    ]


def test_pq_adc_kernel_matches_column(spark):
    kern = _run(spark, use_kernel=True)
    col = _run(spark, use_kernel=False)
    assert len(kern) == len(col) > 0
    for a, b in zip(kern, col):
        # adc_dist must agree BIT-FOR-BIT (same IEEE fold order), not
        # approximately — repr-compare the doubles to catch sign/NaN.
        assert a[:3] == b[:3] and a[4] == b[4], (a, b)
        assert math.isfinite(a[3]) and repr(a[3]) == repr(b[3]), (a, b)
