"""Readers and writers: GTFS static CSV, the partitioned lake, the
GTFS-RT protobuf feed, and the testdata star schema."""

from gtfs_realtime_etl_spark.sources.gtfs_static import load_gtfs_static
from gtfs_realtime_etl_spark.sources.lake import (
    read_locations,
    write_locations_batch,
)
from gtfs_realtime_etl_spark.sources.testdata import load_testdata

__all__ = [
    "load_gtfs_static",
    "load_testdata",
    "read_locations",
    "write_locations_batch",
]
