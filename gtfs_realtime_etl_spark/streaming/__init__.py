"""Structured Streaming ingest + lake maintenance (compaction)."""

from gtfs_realtime_etl_spark.streaming.compaction import compact_partitions
from gtfs_realtime_etl_spark.streaming.ingest import start_feed_file_stream

__all__ = ["compact_partitions", "start_feed_file_stream"]
