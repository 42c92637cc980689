"""Incremental dedup via the at-rest signature index must equal a full
recompute restricted to pairs touching the increment."""

from __future__ import annotations

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.dedup import minhash_lsh_candidates
from gtfs_realtime_etl_spark.operators.dedup_index import (
    banded_signatures,
    incremental_candidates,
    write_signature_index,
)
from gtfs_realtime_etl_spark.sources.testdata import load_testdata
from tests.conftest import SF_CORRECTNESS

KW = dict(num_hashes=32, bands=8, shingle_k=5)


def test_incremental_matches_full_recompute(spark, tmp_path):
    docs = load_testdata(spark, SF_CORRECTNESS, tables=("documents",))[
        "documents"
    ].select("doc_id", "text")
    cut = 400  # old corpus: doc_id < 400; increment: the rest
    old = docs.where(F.col("doc_id") < cut)
    new = docs.where(F.col("doc_id") >= cut)

    idx = str(tmp_path / "sig_index")
    write_signature_index(old, idx, **KW)

    inc = {
        (r["id_a"], r["id_b"])
        for r in incremental_candidates(spark, new, idx, **KW).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, **KW).collect()
    }
    expected = {p for p in full if p[0] >= cut or p[1] >= cut}
    assert inc == expected
    assert inc, "increment produced no candidate pairs — cut too clean?"
    # No already-adjudicated old-vs-old pair leaks through.
    assert all(a >= cut or b >= cut for a, b in inc)


def test_index_append_extends_corpus(spark, tmp_path):
    """Appending an increment's bands to the index makes the NEXT
    increment see it as corpus — the daily-crawl loop."""
    docs = load_testdata(spark, SF_CORRECTNESS, tables=("documents",))[
        "documents"
    ].select("doc_id", "text")
    day1 = docs.where(F.col("doc_id") < 300)
    day2 = docs.where(F.col("doc_id").between(300, 399))
    day3 = docs.where(F.col("doc_id") >= 400)

    idx = str(tmp_path / "sig_index")
    write_signature_index(day1, idx, **KW)
    banded_signatures(day2, **KW).write.partitionBy("band_id").mode(
        "append"
    ).parquet(idx)

    inc = {
        (r["id_a"], r["id_b"])
        for r in incremental_candidates(spark, day3, idx, **KW).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, **KW).collect()
    }
    expected = {p for p in full if p[0] >= 400 or p[1] >= 400}
    assert inc == expected


def test_index_scan_reads_no_text(spark, tmp_path):
    """The whole point of the index: dedup against history without the
    text column existing anywhere in the scan."""
    docs = load_testdata(spark, SF_CORRECTNESS, tables=("documents",))[
        "documents"
    ].select("doc_id", "text")
    idx = str(tmp_path / "sig_index")
    write_signature_index(docs.where(F.col("doc_id") < 100), idx, **KW)
    stored = spark.read.parquet(idx)
    assert set(stored.columns) == {"doc_id", "band_id", "band_key"}
