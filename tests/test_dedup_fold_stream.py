"""Streaming dedup fold (bank 27 over Structured Streaming): the
finalized pair set must equal the one-shot banded-LSH dedup EVEN WHEN
BUCKET CAPS BIND — the strong contract the running-cap dedup_stream
can't give — and the sink must be idempotent under whole-batch and
partial-failure retries."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from gtfs_realtime_etl_spark.operators.dedup import minhash_lsh_dedup
from gtfs_realtime_etl_spark.plans.analytics23 import (
    DEDUP_INC_BANDS,
    DEDUP_INC_K,
    DEDUP_INC_NUM,
    DEDUP_INC_THRESHOLD,
    dedup_incremental_pairs,
)
from gtfs_realtime_etl_spark.sources.testdata import load_testdata
from gtfs_realtime_etl_spark.streaming.dedup_fold import (
    finalize_fold,
    make_dedup_fold_sink,
    start_dedup_fold_stream,
)
from tests.conftest import SF_SMOKE

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
CAP = 3  # deliberately tiny so buckets DO overflow


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _docs(spark):
    return (
        load_testdata(spark, SF_SMOKE, tables=("documents",))["documents"]
        .select("doc_id", "text")
    )


def _one_shot(documents, max_bucket):
    return minhash_lsh_dedup(
        documents,
        num_hashes=DEDUP_INC_NUM,
        bands=DEDUP_INC_BANDS,
        shingle_k=DEDUP_INC_K,
        threshold=DEDUP_INC_THRESHOLD,
        max_bucket=max_bucket,
    ).select(
        "id_a",
        "id_b",
        (F.round(F.col("jaccard") * F.lit(1e6), 0) / F.lit(1e6)).alias(
            "jaccard"
        ),
    )


def _write_slices(rows, src_dir, n_slices):
    os.makedirs(src_dir, exist_ok=True)
    per = (len(rows) + n_slices - 1) // n_slices
    for i in range(n_slices):
        chunk = rows[i * per : (i + 1) * per]
        tbl = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                "text": pa.array([r["text"] for r in chunk], pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(src_dir, f"slice_{i}.parquet"))


def test_stream_fold_equals_one_shot_under_binding_cap(spark, tmp_path):
    documents = _docs(spark)
    rows = documents.orderBy("doc_id").collect()
    src = str(tmp_path / "incoming")
    _write_slices(rows, src, n_slices=3)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_dedup_fold_stream(
        stream,
        index_root=str(tmp_path / "index"),
        cand_root=str(tmp_path / "cands"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        max_bucket=CAP,
    )
    q.awaitTermination(300)

    got = _rows(
        finalize_fold(
            spark,
            documents,
            str(tmp_path / "index"),
            str(tmp_path / "cands"),
            max_bucket=CAP,
        )
    )
    exp = _rows(_one_shot(documents, CAP))
    assert got == exp
    # ... and equals the in-plan batch fold with the same cap.
    assert got == _rows(dedup_incremental_pairs(documents, max_bucket=CAP))
    # The cap must actually bite here, or the "even when caps bind"
    # claim is vacuous.
    assert len(_rows(_one_shot(documents, 100_000))) > len(exp)


def test_sink_retries_are_idempotent(spark, tmp_path):
    documents = _docs(spark)
    index_root = str(tmp_path / "index")
    cand_root = str(tmp_path / "cands")
    ckpt = str(tmp_path / "ckpt")
    sink = make_dedup_fold_sink(index_root, cand_root, ckpt, max_bucket=CAP)

    b0 = documents.filter(F.col("doc_id") % 2 == 0)
    b1 = documents.filter(F.col("doc_id") % 2 == 1)
    sink(b0, 0)
    sink(b1, 1)
    baseline = _rows(
        finalize_fold(spark, documents, index_root, cand_root, max_bucket=CAP)
    )
    assert baseline == _rows(_one_shot(documents, CAP))

    # Whole-batch redelivery: the commit marker short-circuits.
    sink(b1, 1)
    assert baseline == _rows(
        finalize_fold(spark, documents, index_root, cand_root, max_bucket=CAP)
    )

    # Partial failure: marker lost AFTER both appends landed — the
    # retry re-runs the batch against an index that already contains
    # its own rows.  The batch_id != probe guard and the index
    # anti-join guard must leave the finalized result unchanged.
    os.remove(os.path.join(ckpt, "fold_commits", "1"))
    sink(b1, 1)
    assert baseline == _rows(
        finalize_fold(spark, documents, index_root, cand_root, max_bucket=CAP)
    )
