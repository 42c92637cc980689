"""The partitioned parquet lake: writer + reader.

Reference layout (SURVEY.md §1.2): hive-partitioned by year/month/day
with a raw zone (one small snappy file per poll tick,
/root/reference/etl/runtime/handler.py:158-163) and a compacted zone
(few zstd files per day, compaction/runtime/handler.py:129-147).

Spark mapping: ``partitionBy("year","month","day")`` writes the
identical layout; the reader is a plain ``spark.read.parquet(root)`` —
partition discovery, partition pruning (PruneFileSourcePartitions),
parquet predicate/column pushdown all come from Catalyst for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from gtfs_realtime_etl_spark.schemas import LOCATIONS_LAKE

PARTITION_COLS = ("year", "month", "day")


def with_partition_cols(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Derive year/month/day partition columns from the (session-tz)
    event timestamp.

    NB the reference derives partition keys from *wall-clock* time at
    write (``datetime.now``, handler.py:158) — event-time vs
    processing-time skew in partition assignment (SURVEY.md §1.4).  We
    partition by event time, which is the correct behavior at scale
    (late data lands in the right partition); the skew-faithful mode is
    a caller passing its own year/month/day columns.
    """
    ts = F.col(ts_col)
    return (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
    )


def write_locations_batch(
    df: DataFrame,
    root: str,
    mode: str = "append",
    compression: str = "snappy",
    max_records_per_file: int | None = None,
    geoparquet: bool = False,
) -> None:
    """Append one micro-batch (or any enriched positions DataFrame) to the
    hive-partitioned lake.  Raw zone uses snappy (hot tier, reference
    parity handler.py:150); the compacted zone uses zstd (see
    ``streaming/compaction.py``).

    ``geoparquet=True`` stamps the spec'd ``geo`` footer onto the files
    THIS call wrote (reference parity: every per-tick file carries the
    GeoParquet footer, etl/runtime/handler.py:146-154, so external geo
    readers recognize the raw zone too).  Only the batch's touched
    partitions are listed — never the lake — and only new files are
    rewritten; cost is O(tick), paid per micro-batch, so it is opt-in
    (default off keeps the hot append untouched; the compaction rewrite
    stamps for free either way)."""
    if geoparquet and "geometry" in df.columns:
        import glob as _glob
        import os as _os

        part_rows = df.select(*PARTITION_COLS).distinct().collect()
        part_dirs = [
            _os.path.join(
                root, f"year={r.year}", f"month={r.month}", f"day={r.day}"
            )
            for r in part_rows
        ]
        before = {
            f for d in part_dirs for f in _glob.glob(_os.path.join(d, "*.parquet"))
        }
    writer = df.write.mode(mode).partitionBy(*PARTITION_COLS)
    writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(root)
    if geoparquet and "geometry" in df.columns:
        from gtfs_realtime_etl_spark.sources.geoparquet import (
            stamp_geoparquet_files,
        )

        after = {
            f for d in part_dirs for f in _glob.glob(_os.path.join(d, "*.parquet"))
        }
        stamp_geoparquet_files(sorted(after - before), compression=compression)


def read_locations(
    spark: SparkSession, root: str, schema: StructType | None = LOCATIONS_LAKE
) -> DataFrame:
    """Read the whole lake as one logical table (reference: DuckDB
    ``read_parquet('…/year=*/month=*/day=*/*.parquet',
    hive_partitioning=true)``, schedule_deviation.ipynb:489-490).
    Partition-column filters applied by the caller are pruned at plan
    time — never a full scan.

    The schema is PINNED to the canonical lake StructType (S8): one
    evolved/corrupt file cannot silently change the table shape, and
    no inference listing pass runs over a 100 TB lake.  The reference
    needed a unified-schema workaround for exactly this drift
    (compaction/runtime/handler.py:86-102).  ``schema=None`` restores
    inference (parity/debug mode)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(root)


def read_reference_lake(spark: SparkSession, root: str) -> DataFrame:
    """Read a lake written by the REFERENCE pipeline and present it in
    the engine's canonical ``LOCATIONS_LAKE`` shape.

    The reference's GeoParquet writer drops latitude/longitude at write
    time and keeps only the WKB ``geometry`` column
    (etl/runtime/handler.py:131-142); a user migrating an existing
    reference lake therefore has geometry-only rows.  This reader pins
    the reference write schema (``REFERENCE_LAKE``) and re-derives the
    lon/lat doubles from the WKB bytes
    (functions/geo.py::wkb_point_lonlat — the exact inverse of the
    writer's float64 packing, so the roundtrip is bit-exact), yielding
    the same columns ``read_locations`` produces on an engine-written
    lake.  Downstream operators (schedule_deviation, day_slice, the
    notebook SQL shape) run unchanged on either lake.

    Scale shape: one Arrow-batched projection over the scan — no
    shuffle, no join; partition pruning on year/month/day is untouched
    because the decode is a per-row projection on top of the pruned
    scan."""
    from gtfs_realtime_etl_spark.functions.geo import wkb_point_lonlat
    from gtfs_realtime_etl_spark.schemas import REFERENCE_LAKE

    df = spark.read.schema(REFERENCE_LAKE).parquet(root)
    # Single UDF evaluation per row: materialize the struct once, then
    # split it — two independent pt["lat"]/pt["lon"] projections would
    # let the optimizer inline the Arrow UDF twice.
    df = df.withColumn("_pt", wkb_point_lonlat(F.col("geometry")))
    df = df.withColumn("latitude", F.col("_pt.lat")).withColumn(
        "longitude", F.col("_pt.lon")
    )
    # Canonical column order (LOCATIONS_LAKE): lat/lon restored to their
    # pre-drop positions so engine-lake and reference-lake readers are
    # column-for-column interchangeable.
    return df.select(*[f.name for f in LOCATIONS_LAKE.fields])


def day_slice(
    spark: SparkSession,
    root: str,
    year: int,
    month: int,
    day: int,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """One day's partition, pruned at plan time (the reference's
    secondary read path: visualize_locations.ipynb:46-48 reads a single
    ``year=/month=/day=`` glob).  Partition filters on all three keys
    mean the file index lists exactly that day's files — never the lake.
    ``columns`` prunes the parquet scan to the visualization columns."""
    df = read_locations(spark, root).filter(
        (F.col("year") == year) & (F.col("month") == month) & (F.col("day") == day)
    )
    if columns:
        df = df.select(*columns)
    return df


def day_slice_arrow(
    spark: SparkSession,
    root: str,
    year: int,
    month: int,
    day: int,
    columns: tuple[str, ...] | None = None,
):
    """The visualization handoff: one pruned day as a pyarrow Table
    (visualize_locations.ipynb:97-129 hands a day's points to the GPU
    layer as Arrow).  ``DataFrame.toArrow()`` moves the partition
    driver-side in Arrow IPC batches — zero row-at-a-time conversion.
    Driver-side by design: a day slice is the human-scale end of the
    funnel, not a distributed stage."""
    return day_slice(spark, root, year, month, day, columns).toArrow()


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table.

    The 100 TB co-location play: two tables bucketed the same way on
    their join key join WITHOUT any exchange — each bucket pair joins
    locally, so the recurring per-query shuffle of a hot fact⋈fact join
    is paid ONCE at write time.  Same mechanism serves keyed aggs.
    Bucketing requires the table catalog (``saveAsTable``): bucket
    metadata lives in the catalog, not the files; ``path`` makes it an
    external table at that location.  Pinned by
    tests/test_plan_shapes.py::test_bucketed_join_is_shuffle_free.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(name)


def register_locations_view(
    spark: SparkSession, root: str, name: str = "locations"
) -> DataFrame:
    """``CREATE VIEW locations AS SELECT * FROM read_parquet(…)`` parity."""
    df = read_locations(spark, root)
    df.createOrReplaceTempView(name)
    return df
