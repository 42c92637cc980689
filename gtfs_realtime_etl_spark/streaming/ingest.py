"""Structured Streaming ingest: feed payloads → enriched partitioned lake.

Maps the reference's scheduler+lambda micro-batch loop (SURVEY.md §2.7:
EventBridge rate / Step Functions sub-minute loop → poll → enrich →
parquet append) onto the native Spark construct:

    readStream (feed frames) → decode → enrich → foreachBatch append

- Trigger cadence replaces the scheduler: ``trigger(processingTime=
  "30 seconds")`` natively does what the reference needs a Step
  Functions Map loop for (construct.py:26-110).
- ``foreachBatch`` + hive-partitioned append replaces the per-tick
  lambda parquet upload; the empty-batch short-circuit mirrors
  handler.py:82-84.
- Checkpointing gives at-least-once delivery — strictly stronger than
  the reference's at-most-once (retries disabled, DLQ on failure) — and
  the batch-id commit log in :func:`make_idempotent_lake_sink` upgrades
  the lake append to effectively-once under batch retry.
- Beyond-reference hardening (flagged in SURVEY §2.7 T5): optional
  event-time watermark + dropDuplicates on (vehicle_id, timestamp).

Three interchangeable frame sources feed the same pipeline:

- :func:`kafka_feed_frames` — the production path (BASELINE approach:
  "Structured Streaming + Kafka/Kinesis source"): one feed payload per
  Kafka record value.
- :func:`rate_feed_frames` — broker-free stand-in: the built-in ``rate``
  source drives a stream-static join against a payload table, emitting
  real FeedMessage bytes at a controlled cadence (the containerized test
  path for the Kafka shape).
- the ``binaryFile`` stream in :func:`start_feed_file_stream` — one
  payload per file, the shape the reference's poller writes to S3.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gtfs_realtime_etl_spark.operators.ingest import enrich_positions
from gtfs_realtime_etl_spark.sources.gtfs_rt import (
    decode_feed_frames,
    quarantine_feed_frames,
)
from gtfs_realtime_etl_spark.sources.lake import write_locations_batch


def feed_pipeline(
    frames: DataFrame,
    dedup: bool = True,
    watermark: str = "10 minutes",
    with_wkb: bool = True,
) -> DataFrame:
    """payload frames → enriched position rows (works batch or stream)."""
    positions = decode_feed_frames(frames)
    enriched = enrich_positions(positions, with_wkb=with_wkb)
    if dedup:
        if enriched.isStreaming:
            enriched = enriched.withWatermark("timestamp", watermark)
        enriched = enriched.dropDuplicates(["vehicle_id", "timestamp"])
    return enriched


def kafka_feed_frames(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Feed frames from a Kafka topic — one protobuf FeedMessage per
    record value (the production source; replaces the reference's
    EventBridge/SFN poll loop, construct.py:26-110,188-221).

    Requires the Kafka connector on the classpath
    (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark
    version>``); without it ``load()`` raises "Failed to find data
    source: kafka" — see :func:`rate_feed_frames` for the broker-free
    twin used in tests.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").alias("payload"))
    )


def rate_feed_frames(
    spark: SparkSession,
    payloads: Sequence[bytes],
    rows_per_second: int = 10,
) -> DataFrame:
    """Kafka-shaped feed frames without a broker: the built-in ``rate``
    source emits a monotonically increasing ``value``, which indexes
    (mod n, broadcast stream-static join) into a static table of real
    FeedMessage payloads.  Same schema as :func:`kafka_feed_frames`
    (``payload binary``), so everything downstream is identical.
    """
    table = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "idx long, payload binary",
    )
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .withColumn("idx", F.col("value") % F.lit(len(payloads)))
    )
    return rate.join(F.broadcast(table), "idx").select("payload")


def make_idempotent_lake_sink(
    lake_root: str, checkpoint_dir: str, geoparquet: bool = False
):
    """foreachBatch function appending into the hive-partitioned lake,
    made idempotent under batch RETRY via a batch-id commit log.

    Structured Streaming's contract is at-least-once for foreachBatch: a
    failure between the append and the checkpoint commit re-delivers the
    SAME (batch_id, data) on restart.  The sink records each completed
    batch id as a marker file under ``<checkpoint>/lake_commits/`` —
    written through the Hadoop FileSystem API so any scheme the
    checkpoint supports works — and skips batch ids already present, so
    a re-delivered batch cannot double-append.  The unguarded window
    shrinks to a crash BETWEEN append completion and marker creation
    (milliseconds); closing it entirely needs a transactional table
    format (Delta/Iceberg), where the batch id rides in the table's own
    commit log.  Also keeps the empty-batch short-circuit
    (handler.py:82-84).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():  # empty-batch short-circuit (handler.py:82-84)
            return
        spark = batch_df.sparkSession
        jvm = spark._jvm
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{checkpoint_dir}/lake_commits/{batch_id}"
        )
        fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(marker):  # retried batch: already fully appended
            return
        write_locations_batch(batch_df, lake_root, geoparquet=geoparquet)
        fs.mkdirs(marker.getParent())
        fs.create(marker, True).close()

    return sink


def _start_lake_sink(
    enriched: DataFrame,
    lake_root: str,
    checkpoint_dir: str,
    trigger_seconds: int,
    available_now: bool,
    geoparquet: bool = False,
) -> StreamingQuery:
    """Common tail of every ingest stream: idempotent foreachBatch append
    into the hive-partitioned lake."""
    sink = make_idempotent_lake_sink(lake_root, checkpoint_dir, geoparquet)
    writer = (
        enriched.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def _file_frames(spark: SparkSession, feed_dir: str) -> DataFrame:
    return (
        spark.readStream.format("binaryFile")
        # streaming sources need the schema up front (binaryFile's is fixed)
        .schema(
            "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
        )
        .load(feed_dir)
        .select(F.col("content").alias("payload"))
    )


def start_feed_file_stream(
    spark: SparkSession,
    feed_dir: str,
    lake_root: str,
    checkpoint_dir: str,
    trigger_seconds: int = 30,
    dedup: bool = True,
    available_now: bool = False,
    geoparquet: bool = False,
) -> StreamingQuery:
    """Stream feed payload files (one protobuf FeedMessage per file —
    the shape the reference's poller writes) into the lake.

    ``available_now=True`` drains the backlog and stops — the testable
    mode; otherwise runs at the reference's poll cadence.  Undecodable
    payloads are skipped here; run :func:`start_feed_quarantine_stream`
    on the same directory to capture them (DLQ analog).
    """
    enriched = feed_pipeline(_file_frames(spark, feed_dir), dedup=dedup)
    return _start_lake_sink(
        enriched, lake_root, checkpoint_dir, trigger_seconds, available_now,
        geoparquet=geoparquet,
    )


def with_max_event_age(frames: DataFrame, minutes: int | None) -> DataFrame:
    """Drop feed files older than ``minutes`` at processing time — the
    reference's DLQ ``maximum_event_age=15 min`` bound
    (etl/infrastructure/construct.py:196-208): a payload that sat
    unprocessed past the bound is abandoned rather than quarantined
    forever.  Applies to any binaryFile-shaped frame source (needs the
    ``modificationTime`` column); ``minutes=None`` disables the bound.
    ``current_timestamp()`` is fixed per micro-batch, so the cutoff is
    consistent within a batch."""
    if minutes is None:
        return frames
    return frames.filter(
        F.col("modificationTime")
        >= F.current_timestamp() - F.expr(f"INTERVAL {int(minutes)} MINUTES")
    )


def start_feed_quarantine_stream(
    spark: SparkSession,
    feed_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 30,
    available_now: bool = False,
    max_event_age_minutes: int | None = 15,
) -> StreamingQuery:
    """Side-channel query: payloads the decoder rejects land in a
    parquet quarantine with their failure reason, while the main ingest
    keeps flowing — the reference's DLQ (construct.py:186) as a second
    reader over the same source (each query has its own checkpoint, so
    delivery guarantees are independent).  ``max_event_age_minutes``
    mirrors the reference's 15-minute DLQ event-age bound (see
    :func:`with_max_event_age`); pass ``None`` to quarantine
    regardless of age."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
        )
        .load(feed_dir)
    )
    raw = with_max_event_age(raw, max_event_age_minutes)
    bad = quarantine_feed_frames(raw.select(F.col("content").alias("payload")))
    writer = (
        bad.writeStream.format("parquet")
        .outputMode("append")
        .option("path", quarantine_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_feed_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    lake_root: str,
    checkpoint_dir: str,
    trigger_seconds: int = 30,
    dedup: bool = True,
    starting_offsets: str = "latest",
) -> StreamingQuery:
    """Kafka topic → decode → enrich → partitioned lake (the BASELINE
    production shape)."""
    frames = kafka_feed_frames(spark, bootstrap_servers, topic, starting_offsets)
    enriched = feed_pipeline(frames, dedup=dedup)
    return _start_lake_sink(
        enriched, lake_root, checkpoint_dir, trigger_seconds, available_now=False
    )


def start_feed_http_stream(
    spark: SparkSession,
    url: str,
    spool_dir: str,
    lake_root: str,
    checkpoint_dir: str,
    trigger_seconds: int = 30,
    dedup: bool = True,
    geoparquet: bool = False,
    max_ticks: int | None = None,
    headers: dict[str, str] | None = None,
) -> StreamingQuery:
    """HTTP poll → decode → enrich → partitioned lake via the native
    ``gtfs_rt`` streaming source (sources/gtfs_rt_source.py) — the
    engine-managed form of the reference's lambda poll loop
    (etl/runtime/handler.py:43-54): offsets live in the streaming
    checkpoint, every payload is spooled for deterministic replay, and
    the downstream pipeline is byte-identical to the Kafka/file paths.
    ``max_ticks`` bounds the poll (tests/backfills); None polls
    forever at the trigger cadence."""
    from gtfs_realtime_etl_spark.sources.gtfs_rt_source import register

    register(spark)
    reader = (
        spark.readStream.format("gtfs_rt")
        .option("url", url)
        .option("spool_dir", spool_dir)
    )
    if max_ticks is not None:
        reader = reader.option("max_ticks", str(max_ticks))
    if headers:
        import json as _json

        reader = reader.option("headers", _json.dumps(headers))
    frames = reader.load().select("payload")
    enriched = feed_pipeline(frames, dedup=dedup)
    return _start_lake_sink(
        enriched, lake_root, checkpoint_dir, trigger_seconds,
        available_now=False, geoparquet=geoparquet,
    )


def start_feed_rate_stream(
    spark: SparkSession,
    payloads: Sequence[bytes],
    lake_root: str,
    checkpoint_dir: str,
    rows_per_second: int = 10,
    trigger_seconds: int = 1,
    dedup: bool = True,
) -> StreamingQuery:
    """Broker-free twin of :func:`start_feed_kafka_stream` for tests and
    local soak runs: same pipeline, rate-driven payload replay."""
    frames = rate_feed_frames(spark, payloads, rows_per_second)
    enriched = feed_pipeline(frames, dedup=dedup)
    return _start_lake_sink(
        enriched, lake_root, checkpoint_dir, trigger_seconds, available_now=False
    )
