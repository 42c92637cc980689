"""End-to-end streaming ingest (protobuf feed files → lake) and the
compaction maintenance job (row conservation + file-count reduction)."""

from __future__ import annotations

import glob
import os

import pytest

from gtfs_realtime_etl_spark.sources.gtfs_rt import encode_feed, parse_feed
from gtfs_realtime_etl_spark.streaming.compaction import (
    compact_partition,
    dates_in_range,
)
from gtfs_realtime_etl_spark.streaming.ingest import start_feed_file_stream


def _mk_records(tick: int, n: int = 5) -> list[dict]:
    base_ts = 1709650800 + tick * 30  # 2024-03-05 09:20 America/Toronto
    return [
        {
            "trip_id": f"T{i:03d}",
            "route_id": f"R{i % 4:02d}",
            "direction_id": str(i % 2),
            "vehicle_id": f"V{i:03d}",
            "latitude": 43.65 + i * 1e-4,
            "longitude": -79.38 - i * 1e-4,
            "bearing": 90.0,
            "speed": 12.5,
            "timestamp": base_ts + i,
        }
        for i in range(n)
    ]


def test_protobuf_roundtrip():
    recs = _mk_records(0)
    decoded = parse_feed(encode_feed(recs))
    assert len(decoded) == len(recs)
    for got, exp in zip(decoded, recs):
        assert got["trip_id"] == exp["trip_id"]
        assert got["route_id"] == exp["route_id"]
        assert got["direction_id"] == exp["direction_id"]
        assert got["vehicle_id"] == exp["vehicle_id"]
        assert got["timestamp"] == exp["timestamp"]
        assert got["latitude"] == pytest.approx(exp["latitude"], abs=1e-5)
        assert got["speed"] == pytest.approx(exp["speed"], abs=1e-5)


def test_protobuf_missing_fields():
    # HasField-style nulls: a vehicle with no trip and no position
    payload = encode_feed([{"vehicle_id": "V1", "timestamp": 1709650800}])
    (rec,) = parse_feed(payload)
    assert rec["trip_id"] is None
    assert rec["latitude"] is None
    assert rec["vehicle_id"] == "V1"


def test_stream_ingest_to_lake(spark, tmp_path):
    feed_dir = tmp_path / "feeds"
    feed_dir.mkdir()
    n_ticks, per_tick = 6, 5
    for tick in range(n_ticks):
        (feed_dir / f"feed_{tick:04d}.pb").write_bytes(
            encode_feed(_mk_records(tick, per_tick))
        )

    lake_root = str(tmp_path / "lake")
    q = start_feed_file_stream(
        spark,
        str(feed_dir),
        lake_root,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    lake = spark.read.parquet(lake_root)
    # distinct (vehicle, ts) rows survive the dropDuplicates hardening
    assert lake.count() == n_ticks * per_tick
    cols = set(lake.columns)
    assert {"trip_id", "geohash", "geometry", "bbox", "year", "month", "day"} <= cols
    assert lake.filter("year = 2024 AND month = 3 AND day = 5").count() == lake.count()


def test_compaction_conserves_rows(spark, tmp_path):
    feed_dir = tmp_path / "feeds"
    feed_dir.mkdir()
    for tick in range(8):
        (feed_dir / f"feed_{tick:04d}.pb").write_bytes(
            encode_feed(_mk_records(tick, 10))
        )
    raw_root = str(tmp_path / "raw")
    q = start_feed_file_stream(
        spark, str(feed_dir), raw_root, str(tmp_path / "ckpt2"), available_now=True
    )
    q.awaitTermination(120)

    compacted_root = str(tmp_path / "compacted")
    n = compact_partition(
        spark, raw_root, compacted_root, 2024, 3, 5, target_files=1
    )
    raw_count = spark.read.parquet(raw_root).count()
    comp_count = spark.read.parquet(compacted_root).count()
    assert n == raw_count == comp_count  # row conservation
    files = glob.glob(
        os.path.join(compacted_root, "year=2024/month=3/day=5", "*.parquet")
    )
    assert len(files) == 1  # small files collapsed


def test_dates_in_range():
    import datetime as dt

    now = dt.datetime(2024, 3, 5, 1, 0)
    days = dates_in_range(3, period="day", now=now)
    assert days == [dt.date(2024, 3, 4), dt.date(2024, 3, 3), dt.date(2024, 3, 2)]
    months = dates_in_range(2, period="month", now=now)
    assert months == [dt.date(2024, 2, 1), dt.date(2024, 1, 1)]
