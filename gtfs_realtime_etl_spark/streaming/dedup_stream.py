"""Streaming near-dup ingestion against the at-rest MinHash index.

The production LLM-data shape: documents arrive continuously; each
micro-batch must be deduped against EVERYTHING already ingested
without re-reading or re-hashing historical text.  This module wires
``operators/dedup_index.py`` into Structured Streaming:

per micro-batch (foreachBatch):
  1. candidate pairs = ``incremental_candidates`` (new-vs-corpus and
     new-vs-new in one pass, via the stored banded-signature table) —
     appended to ``pairs_root``;
  2. the batch's banded signatures are appended to the index
     (partitioned by band_id), so the NEXT batch dedups against this
     one.

Ordering inside the batch matters: candidates are computed BEFORE the
index append (the index must reflect only prior batches; same-batch
pairs come from the new-vs-new half of ``incremental_candidates``).

Equivalence contract (pinned by tests/test_dedup_stream.py): when
bucket caps don't bind, streaming a corpus through in ANY batch
partitioning yields exactly the batch pipeline's candidate set — each
pair {a, b} is discovered in the batch where its LATER member arrives.

Idempotency: two independent guards.  The batch-id commit log (same
pattern as ``streaming/ingest.py::make_idempotent_lake_sink``) skips a
whole-batch redelivery.  A crash BETWEEN an append and the marker write
re-runs the batch, so each append is additionally idempotent on its
own: the pairs output is deduplicated at read (``read_candidate_pairs``
distinct), and the index append anti-joins the batch's (id, band_id)
rows against the stored index rows OF THIS BATCH (the index carries a
``batch_id`` partition column, so the guard read partition-prunes to
the retried batch's own directories — O(batch), not O(index), and empty
on a clean first attempt) — a retry after partial failure appends only
the rows the crashed attempt did not commit, preserving the
one-row-per-(doc, band) invariant that bucket-size caps rely on.

ASSUMPTION (load-bearing): document ids are immutable and unique across
the stream's lifetime — a doc_id is ingested once, and its text never
changes.  Structured Streaming replays a failed micro-batch with the
SAME batch_id, which the guards above handle; a SOURCE that re-emits an
already-ingested doc_id in a LATER batch (same or changed text) is
outside the contract: the index would hold two signature sets for that
id (stale + new), candidate pairs may include (id, id) artifacts, and
bucket caps count the id twice.  If your source can re-deliver, dedup
upstream on doc_id (e.g. ``dropDuplicates`` with a watermark) before
this sink.

Scale shape: per batch, ONE narrow scan of the stored index
((id, band_id, band_key) — never the text), one exchange on
(band_id, band_key), buckets with no new member skipped before the
pair explode.  Index growth is linear in corpus cardinality, not bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gtfs_realtime_etl_spark.operators.dedup import DEFAULT_MAX_BUCKET
from gtfs_realtime_etl_spark.operators.dedup_index import (
    banded_signatures,
    incremental_candidates,
)


def make_dedup_index_sink(
    index_root: str,
    pairs_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket: int = DEFAULT_MAX_BUCKET,
):
    """foreachBatch function: dedup the batch against the index, then
    extend the index.  Safe under batch retry (commit log)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        jvm = spark._jvm
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{checkpoint_dir}/dedup_commits/{batch_id}"
        )
        fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(marker):  # retried batch: already processed
            return

        # foreachBatch may hand over a streaming-tagged frame whose plan
        # can't be re-executed twice; pin the batch rows first.  The
        # batch is micro-batch-sized (not corpus-sized) by construction.
        batch = batch_df.localCheckpoint(eager=True)

        index_exists = fs.exists(
            jvm.org.apache.hadoop.fs.Path(index_root)
        )
        if index_exists:
            pairs = incremental_candidates(
                spark,
                batch,
                index_root,
                text_col=text_col,
                id_col=id_col,
                num_hashes=num_hashes,
                bands=bands,
                shingle_k=shingle_k,
                max_bucket=max_bucket,
            )
        else:
            # First batch: no stored index yet — new-vs-new only, via
            # the same pipeline against an empty stored side.
            from gtfs_realtime_etl_spark.operators.dedup import (
                minhash_lsh_candidates,
            )

            pairs = minhash_lsh_candidates(
                batch,
                text_col=text_col,
                id_col=id_col,
                num_hashes=num_hashes,
                bands=bands,
                shingle_k=shingle_k,
                max_bucket=max_bucket,
            ).select("id_a", "id_b")
        pairs.write.mode("append").parquet(pairs_root)

        sigs = banded_signatures(
            batch, text_col, id_col, num_hashes, bands, shingle_k
        ).withColumn("batch_id", F.lit(batch_id))
        if index_exists:
            # Partial-failure guard: if a prior attempt crashed after
            # committing (some of) the index append but before the
            # marker, this retry must not double-append.  Anti-join on
            # (id, band_id) against the stored rows of THIS batch only:
            # batch_id is a partition column, so the read prunes to the
            # retried batch's own directories (empty on a clean
            # attempt) — O(batch) cost however large the index grows —
            # and reads one data column (the id) plus partition keys,
            # never the signatures.  Sufficient because Structured
            # Streaming replays a failed batch under the SAME batch_id
            # and doc ids are unique across batches (module contract).
            stored = (
                spark.read.parquet(index_root)
                .where(F.col("batch_id") == batch_id)
                .select(id_col, "band_id")
            )
            sigs = sigs.join(stored, [id_col, "band_id"], "left_anti")
        sigs.write.partitionBy("band_id", "batch_id").mode("append").parquet(
            index_root
        )

        fs.mkdirs(marker.getParent())
        fs.create(marker, True).close()

    return sink


def start_dedup_stream(
    docs_stream: DataFrame,
    index_root: str,
    pairs_root: str,
    checkpoint_dir: str,
    available_now: bool = False,
    trigger_seconds: int = 30,
    **dedup_kwargs,
) -> StreamingQuery:
    """Attach the dedup-index sink to a streaming document source."""
    writer = (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", f"{checkpoint_dir}/engine")
        .foreachBatch(
            make_dedup_index_sink(
                index_root, pairs_root, checkpoint_dir, **dedup_kwargs
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def read_candidate_pairs(spark: SparkSession, pairs_root: str) -> DataFrame:
    """All candidate pairs discovered so far (id_a < id_b, distinct —
    a pair can legitimately recur across batches only via retry, which
    the commit log already excludes; distinct() guards the read path
    anyway)."""
    return spark.read.parquet(pairs_root).distinct()
