"""Small-file compaction — the lake maintenance job.

Reference: a cron lambda rewrites each day's many per-tick files into a
few zstd-15 files with 61,440–122,880-row groups
(/root/reference/compaction/runtime/handler.py:104-127), daily per-day
and monthly per-month (:129-147), driven by a date-range enumerator
(:150-167).

Spark mapping (SURVEY.md §2.1 S9-S11): partition-scoped read →
coalesce → zstd write with ``maxRecordsPerFile``.  No S3 listing code —
Spark's file index does discovery; no schema pinning workaround — the
lake writes uniform schemas.  ``preserve_order`` of the reference is
upgraded to an explicit ``sortWithinPartitions(timestamp)``, which also
gives parquet min/max row-group statistics their pruning power.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from pyspark.sql import SparkSession

#: Reference row-group band (compaction/runtime/handler.py:105-107).
MAX_RECORDS_PER_FILE = 122_880


def dates_in_range(
    duration: int,
    timezone: str = "America/Toronto",
    period: str = "day",
    include_current: bool = False,
    now: dt.datetime | None = None,
) -> list[dt.date]:
    """Enumerate the last ``duration`` days/months in the agency tz
    (reference driver semantics, handler.py:150-167)."""
    now = now or dt.datetime.now(ZoneInfo(timezone))
    today = now.date()
    out: list[dt.date] = []
    if period == "day":
        start = 0 if include_current else 1
        for i in range(start, duration + start):
            out.append(today - dt.timedelta(days=i))
    elif period == "month":
        year, month = today.year, today.month
        if not include_current:
            month -= 1
        for _ in range(duration):
            if month < 1:
                month += 12
                year -= 1
            out.append(dt.date(year, month, 1))
            month -= 1
    else:
        raise ValueError(f"period must be day|month, got {period!r}")
    return out


def compact_partition(
    spark: SparkSession,
    source_root: str,
    target_root: str,
    year: int,
    month: int,
    day: int | None = None,
    target_files: int = 1,
    compression: str = "zstd",
    max_records_per_file: int = MAX_RECORDS_PER_FILE,
    sort_col: str | None = "timestamp",
    geoparquet: bool = False,
) -> int:
    """Rewrite one partition (day, or whole month when ``day`` is None)
    from the raw zone into the compacted zone.  Returns rows written.

    Partition-scoped read → partition pruning keeps this O(partition),
    never O(lake).  The rewrite itself is shuffle-free: coalesce only
    narrows parallelism, and the sort is within partitions.

    ``geoparquet=True`` stamps the spec'd ``geo`` footer metadata on the
    compacted files (S5 external-reader parity: the reference's writer
    emits GeoParquet, handler.py:146-152) — done here because the
    compaction rewrite is the natural place to pay a footer rewrite.
    """
    part = f"year={year}/month={month}"
    if day is not None:
        part += f"/day={day}"
    src = f"{source_root}/{part}"
    df = spark.read.parquet(src)
    if sort_col and sort_col in df.columns:
        df = df.sortWithinPartitions(sort_col)
    n = df.count()
    (
        df.coalesce(target_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(f"{target_root}/{part}")
    )
    if geoparquet and "geometry" in df.columns:
        from gtfs_realtime_etl_spark.sources.geoparquet import stamp_geoparquet

        stamp_geoparquet(f"{target_root}/{part}", compression=compression)
    return n


def compact_partitions(
    spark: SparkSession,
    source_root: str,
    target_root: str,
    duration: int = 1,
    period: str = "day",
    timezone: str = "America/Toronto",
    include_current: bool = False,
    now: dt.datetime | None = None,
    target_files: int = 1,
) -> dict[str, int]:
    """The scheduled job body: compact the last N closed day/month
    partitions (daily 01:00 / monthly day-1 crons in the reference,
    compaction/infrastructure/construct.py:102-140)."""
    written: dict[str, int] = {}
    for d in dates_in_range(duration, timezone, period, include_current, now):
        day = d.day if period == "day" else None
        try:
            n = compact_partition(
                spark,
                source_root,
                target_root,
                d.year,
                d.month,
                day,
                target_files=target_files,
            )
        except Exception as e:  # partition may not exist yet — skip like the reference
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                continue
            raise
        key = f"{d.year}-{d.month:02d}" + (f"-{d.day:02d}" if day else "")
        written[key] = n
    return written
