"""Streaming twin of bank 27's incremental MinHash-LSH dedup fold.

``streaming/dedup_stream.py`` (round 6) already lands a near-dup index
continuously, but its per-batch candidates are emitted under a RUNNING
bucket cap, so its batch-twin equivalence holds only when caps don't
bind.  This module wires the bank-27 fold primitives
(``plans/analytics23.py::probe_index`` / ``finalize_dedup_candidates``)
into Structured Streaming instead: per micro-batch the sink emits
probe_index's candidates (new-vs-index + new-vs-new, running-cap
guarded as a pure scale protection) and extends the standing banded
index; ``finalize_fold`` then re-filters the accumulated candidates
against FINAL bucket sizes — so the finalized verified pair set equals
the one-shot banded-LSH dedup EVEN WHEN CAPS BIND, the proven
fold==one-shot contract of ``tests/test_dedup_incremental.py``, now
with Structured Streaming as the arrival mechanism.

Idempotency follows the house pattern (``streaming/ingest.py``,
``streaming/dedup_stream.py``): a batch-id commit marker skips
whole-batch redelivery, and the two appends are each retry-safe on
their own — the index append anti-joins against THIS batch's stored
rows (``batch_id`` is a partition column, so the guard read prunes to
the retried batch's directories: O(batch), not O(index)), and the
candidate append may duplicate rows on a crash-retry, which
``finalize_dedup_candidates``'s terminal ``distinct()`` absorbs.  One
hazard is specific to the fold: a retry AFTER a partial index append
would otherwise probe an index already containing (some of) its own
batch, emitting self-pairs; the probe therefore reads the index with
``batch_id != current`` — partition-pruned to exactly the pre-batch
state a clean first attempt would have seen.

Same doc-id contract as dedup_stream: ids are unique and immutable
across the stream's lifetime; dedup re-deliveries upstream.

Scale shape: each batch signs ONLY its own text (one fused Arrow
pass), probes the index with one exchange on (band_id, band_key), and
appends O(batch) rows; history is never re-signed or re-read beyond
the narrow (doc_id, band_id, band_key) columns.  Finalize is one
count-per-bucket aggregate over the index plus a semi-join — the
merge step of the SUM-monoid bucket sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gtfs_realtime_etl_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    jaccard_pairs,
)
from gtfs_realtime_etl_spark.plans.analytics23 import (
    DEDUP_INC_BANDS,
    DEDUP_INC_K,
    DEDUP_INC_NUM,
    DEDUP_INC_THRESHOLD,
    finalize_dedup_candidates,
    lsh_band_rows,
    probe_index,
)

_INDEX_COLS = ("doc_id", "band_id", "band_key")


def make_dedup_fold_sink(
    index_root: str,
    cand_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEDUP_INC_NUM,
    bands: int = DEDUP_INC_BANDS,
    shingle_k: int = DEDUP_INC_K,
    max_bucket: int = DEFAULT_MAX_BUCKET,
):
    """foreachBatch function: probe the batch against the standing
    index (bank-27 semantics), append candidates + band rows."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        jvm = spark._jvm
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{checkpoint_dir}/fold_commits/{batch_id}"
        )
        fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(marker):  # retried batch: already processed
            return

        # Pin the batch rows (streaming-tagged plans can't re-execute);
        # micro-batch-sized by construction.
        batch = batch_df.localCheckpoint(eager=True)
        new_rows = lsh_band_rows(
            batch,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
        )

        index_exists = fs.exists(jvm.org.apache.hadoop.fs.Path(index_root))
        index_rows = None
        if index_exists:
            # batch_id != current: a retry after a partial index append
            # must probe the PRE-batch index, or new-vs-index would emit
            # self-pairs against its own half-appended rows.  Partition
            # column, so this prunes rather than scans.
            index_rows = (
                spark.read.parquet(index_root)
                .where(F.col("batch_id") != batch_id)
                .select(*_INDEX_COLS)
            )
        cands = probe_index(new_rows, index_rows, max_bucket)
        cands.write.mode("append").parquet(cand_root)

        sigs = new_rows.withColumn("batch_id", F.lit(batch_id))
        if index_exists:
            stored = (
                spark.read.parquet(index_root)
                .where(F.col("batch_id") == batch_id)
                .select("doc_id", "band_id")
            )
            sigs = sigs.join(stored, ["doc_id", "band_id"], "left_anti")
        sigs.write.partitionBy("batch_id").mode("append").parquet(index_root)

        fs.mkdirs(marker.getParent())
        fs.create(marker, True).close()

    return sink


def start_dedup_fold_stream(
    docs_stream: DataFrame,
    index_root: str,
    cand_root: str,
    checkpoint_dir: str,
    available_now: bool = False,
    trigger_seconds: int = 30,
    **fold_kwargs,
) -> StreamingQuery:
    """Attach the fold sink to a streaming document source."""
    writer = (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", f"{checkpoint_dir}/engine")
        .foreachBatch(
            make_dedup_fold_sink(
                index_root, cand_root, checkpoint_dir, **fold_kwargs
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def finalize_fold(
    spark: SparkSession,
    documents: DataFrame,
    index_root: str,
    cand_root: str,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    shingle_k: int = DEDUP_INC_K,
    threshold: float = DEDUP_INC_THRESHOLD,
) -> DataFrame:
    """The merge step: accumulated candidates re-filtered against FINAL
    bucket sizes, then exact shingle-Jaccard verification — the same
    terminal as ``plans/analytics23.py::dedup_incremental_pairs``, so
    the result is row-identical to the one-shot under any bucket cap
    and any micro-batch slicing."""
    kept = finalize_dedup_candidates(
        spark.read.parquet(cand_root),
        spark.read.parquet(index_root).select(*_INDEX_COLS),
        max_bucket,
    )
    verified = jaccard_pairs(
        documents, kept, shingle_k=shingle_k, threshold=threshold
    )
    return verified.select(
        "id_a",
        "id_b",
        (F.round(F.col("jaccard") * F.lit(1e6), 0) / F.lit(1e6)).alias(
            "jaccard"
        ),
    )
