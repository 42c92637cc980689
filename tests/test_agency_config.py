"""Per-agency env-driven configuration (reference ETLSettings parity:
etl/infrastructure/config.py:11-38 — feed URL, API key + header, IANA
timezone, cadence, destination bucket per agency; deploy.sh:4-8 shows
two cities deployed from two env files)."""

from __future__ import annotations

import os

from gtfs_realtime_etl_spark.config import AgencyConfig
from gtfs_realtime_etl_spark.schemas import VEHICLE_POSITIONS_RAW
from gtfs_realtime_etl_spark.sources.lake import read_locations

TWO_CITY_ENV = {
    # city 1: Edmonton-shaped (reference defaults)
    "YEG_VEH_POSITION_URL": "https://transit.example/yeg/vehicle-positions.pb",
    "YEG_SCHEDULE_SECONDS": "60",
    "YEG_TIMEZONE": "America/Edmonton",
    "YEG_DESTINATION_BUCKET": "__set_in_test__",
    # city 2: Toronto-shaped, API-key protected
    "YYZ_VEH_POSITION_URL": "https://transit.example/yyz/vehicle-positions.pb",
    "YYZ_SCHEDULE_SECONDS": "30",
    "YYZ_TIMEZONE": "America/Toronto",
    "YYZ_DESTINATION_BUCKET": "__set_in_test__",
    "YYZ_API_KEY": "sekrit",
    "YYZ_API_KEY_HEADER": "x-api-key",
}


def test_two_city_configs_from_env_alone(tmp_path):
    env = dict(TWO_CITY_ENV)
    env["YEG_DESTINATION_BUCKET"] = str(tmp_path / "yeg_lake")
    env["YYZ_DESTINATION_BUCKET"] = str(tmp_path / "yyz_lake")

    yeg = AgencyConfig.from_env(prefix="YEG_", env=env)
    yyz = AgencyConfig.from_env(prefix="YYZ_", env=env)

    assert yeg.veh_position_url.endswith("/yeg/vehicle-positions.pb")
    assert yeg.schedule_seconds == 60
    assert yeg.timezone == "America/Edmonton"
    assert yeg.request_headers() == {}  # no API key configured

    assert yyz.schedule_seconds == 30
    assert yyz.timezone == "America/Toronto"
    assert yyz.request_headers() == {"x-api-key": "sekrit"}


def test_unprefixed_reference_env_names():
    """prefix='' is drop-in parity with the reference lambda's env."""
    env = {
        "VEH_POSITION_URL": "https://transit.example/vp.pb",
        "TIMEZONE": "America/Vancouver",
        "SCHEDULE_SECONDS": "45",
    }
    cfg = AgencyConfig.from_env(prefix="", env=env)
    assert cfg.veh_position_url == "https://transit.example/vp.pb"
    assert cfg.timezone == "America/Vancouver"
    assert cfg.schedule_seconds == 45
    assert cfg.lake_root is None


def test_two_city_pipelines_from_env(spark, tmp_path, monkeypatch):
    """Two configs drive two isolated ingest pipelines end-to-end (the
    deployment story: same code, different env prefix per city)."""
    import pandas as pd

    from gtfs_realtime_etl_spark.operators.ingest import enrich_positions
    from gtfs_realtime_etl_spark.sources.lake import write_locations_batch

    env = dict(TWO_CITY_ENV)
    env["YEG_DESTINATION_BUCKET"] = str(tmp_path / "yeg_lake")
    env["YYZ_DESTINATION_BUCKET"] = str(tmp_path / "yyz_lake")
    cities = [AgencyConfig.from_env(prefix=p, env=env) for p in ("YEG_", "YYZ_")]

    base_ts = 1_709_600_000
    for i, cfg in enumerate(cities):
        rows = [
            {
                "trip_id": f"t{i}{j}",
                "route_id": f"r{i}",
                "direction_id": None,
                "vehicle_id": f"veh{i}{j}",
                "latitude": 53.5 + i,
                "longitude": -113.5 - i,
                "bearing": None,
                "speed": None,
                "timestamp": base_ts + j,
            }
            for j in range(5)
        ]
        raw = spark.createDataFrame(pd.DataFrame(rows), schema=VEHICLE_POSITIONS_RAW)
        write_locations_batch(enrich_positions(raw), cfg.lake_root)

    yeg_lake = read_locations(spark, cities[0].lake_root)
    yyz_lake = read_locations(spark, cities[1].lake_root)
    assert yeg_lake.count() == 5 and yyz_lake.count() == 5
    # isolation: each city's rows only in its own lake
    assert yeg_lake.filter("route_id = 'r0'").count() == 5
    assert yyz_lake.filter("route_id = 'r1'").count() == 5


def test_poll_once_uses_configured_headers(tmp_path, monkeypatch):
    """The configured API key header reaches the HTTP request and the
    payload lands atomically in the inbox (handler.py:43-54 parity)."""
    import gtfs_realtime_etl_spark.sources.poller as poller_mod

    seen = {}

    class FakeResp:
        def read(self):
            return b"\x0a\x00"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        seen["headers"] = dict(req.header_items())
        seen["url"] = req.full_url
        return FakeResp()

    monkeypatch.setattr(poller_mod.urllib.request, "urlopen", fake_urlopen)

    env = dict(TWO_CITY_ENV)
    env["YYZ_DESTINATION_BUCKET"] = str(tmp_path / "lake")
    cfg = AgencyConfig.from_env(prefix="YYZ_", env=env)
    out = cfg.poll_once(str(tmp_path / "inbox"))
    assert os.path.exists(out) and open(out, "rb").read() == b"\x0a\x00"
    assert seen["url"] == cfg.veh_position_url
    assert {k.lower(): v for k, v in seen["headers"].items()}["x-api-key"] == "sekrit"


def test_two_city_ingest_through_config(spark, tmp_path):
    """The full deployment loop from env alone: AgencyConfig → fetch
    (stubbed payloads in the inbox) → cfg.start_ingest (file stream at
    the configured cadence, availableNow drain) → each city's lake —
    isolated lakes, enriched schema, correct partitioning."""
    from gtfs_realtime_etl_spark.sources.gtfs_rt import encode_feed

    env = dict(TWO_CITY_ENV)
    env["YEG_DESTINATION_BUCKET"] = str(tmp_path / "yeg_lake")
    env["YYZ_DESTINATION_BUCKET"] = str(tmp_path / "yyz_lake")
    cities = [AgencyConfig.from_env(prefix=p, env=env) for p in ("YEG_", "YYZ_")]

    base_ts = 1_709_650_800  # 2024-03-05
    for i, cfg in enumerate(cities):
        inbox = tmp_path / f"inbox{i}"
        inbox.mkdir()
        for tick in range(3):
            records = [
                {
                    "trip_id": f"t{i}{tick}{j}",
                    "route_id": f"r{i}",
                    "vehicle_id": f"veh{i}{j}",
                    "latitude": 53.5 + i,
                    "longitude": -113.5 - i,
                    "timestamp": base_ts + tick * 60 + j,
                }
                for j in range(4)
            ]
            (inbox / f"feed_{tick:04d}.pb").write_bytes(encode_feed(records))
        q = cfg.start_ingest(
            spark,
            feed_dir=str(inbox),
            checkpoint_dir=str(tmp_path / f"ckpt{i}"),
            available_now=True,
        )
        q.awaitTermination(120)

    from gtfs_realtime_etl_spark.sources.lake import read_locations

    for i, cfg in enumerate(cities):
        lake = read_locations(spark, cfg.lake_root)
        assert lake.count() == 12, cfg.name
        assert lake.filter(f"route_id = 'r{i}'").count() == 12  # isolation
        assert {"geohash", "geometry", "bbox", "year", "month", "day"} <= set(
            lake.columns
        )
        assert lake.filter("year = 2024 AND month = 3").count() == 12
