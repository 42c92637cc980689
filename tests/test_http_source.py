"""Native ``gtfs_rt`` streaming HTTP source (PySpark Python DataSource
API): poll → decode → enrich → lake, equivalent to the file-bridge
path on the same payloads; spool-based replay contract."""

from __future__ import annotations

import http.server
import threading
import time

import pytest

from gtfs_realtime_etl_spark.sources.gtfs_rt import encode_feed
from gtfs_realtime_etl_spark.sources.gtfs_rt_source import (
    GtfsRtStreamReader,
    _find_spool,
)
from gtfs_realtime_etl_spark.streaming.ingest import (
    start_feed_file_stream,
    start_feed_http_stream,
)
from tests.test_streaming_compaction import _mk_records

N_TICKS = 3
PAYLOADS = [encode_feed(_mk_records(tick, 5)) for tick in range(N_TICKS)]


@pytest.fixture()
def rotating_feed_server():
    """Serves PAYLOADS[i] for the i-th request — each poll tick sees a
    fresh FeedMessage, like a real agency endpoint."""
    state = {"i": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            payload = PAYLOADS[min(state["i"], N_TICKS - 1)]
            state["i"] += 1
            self.send_response(200)
            self.send_header("Content-Type", "application/x-protobuf")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/feed.pb"
    srv.shutdown()


def test_http_stream_matches_file_path(spark, tmp_path, rotating_feed_server):
    """readStream.format('gtfs_rt') end-to-end into the lake: same rows
    as the file-bridge pipeline fed the identical payloads."""
    http_lake = str(tmp_path / "http_lake")
    q = start_feed_http_stream(
        spark,
        url=rotating_feed_server,
        spool_dir=str(tmp_path / "spool"),
        lake_root=http_lake,
        checkpoint_dir=str(tmp_path / "http_ckpt"),
        trigger_seconds=1,
        max_ticks=N_TICKS,
    )
    try:
        deadline = time.time() + 120
        expected = 5 * N_TICKS
        while time.time() < deadline:
            try:
                if spark.read.parquet(http_lake).count() >= expected:
                    break
            except Exception:
                pass  # lake dir not created yet
            time.sleep(1)
    finally:
        q.stop()

    # Reference path: the same payloads through the file bridge.
    feed_dir = tmp_path / "feeds"
    feed_dir.mkdir()
    for i, p in enumerate(PAYLOADS):
        (feed_dir / f"feed_{i:04d}.pb").write_bytes(p)
    file_lake = str(tmp_path / "file_lake")
    fq = start_feed_file_stream(
        spark, str(feed_dir), file_lake, str(tmp_path / "file_ckpt"),
        available_now=True,
    )
    fq.awaitTermination(120)

    cols = ["trip_id", "vehicle_id", "timestamp", "latitude", "longitude",
            "geohash", "year", "month", "day"]
    got = sorted(map(tuple, spark.read.parquet(http_lake).select(*cols).collect()))
    exp = sorted(map(tuple, spark.read.parquet(file_lake).select(*cols).collect()))
    assert got == exp and len(got) == 5 * N_TICKS

    # every tick's raw payload was spooled (replay archive)
    for tick in range(N_TICKS):
        assert _find_spool(str(tmp_path / "spool"), tick) is not None


def test_reader_offsets_spool_and_replay(tmp_path, rotating_feed_server):
    """Unit contract of the simple reader: offsets advance per fetch,
    drain at max_ticks, and readBetweenOffsets replays the exact spooled
    bytes (recovery never re-polls the endpoint)."""
    spool = str(tmp_path / "spool")
    r = GtfsRtStreamReader(
        {"url": rotating_feed_server, "spool_dir": spool, "max_ticks": "2"}
    )
    assert r.initialOffset() == {"tick": 0}
    rows0, off1 = r.read({"tick": 0})
    rows0 = list(rows0)
    assert off1 == {"tick": 1} and len(rows0) == 1
    assert rows0[0][1] == PAYLOADS[0]
    rows1, off2 = r.read(off1)
    rows1_list = list(rows1)
    assert rows1_list[0][1] == PAYLOADS[1] and off2 == {"tick": 2}
    # drained: no rows, no progress
    rows2, off3 = r.read(off2)
    assert list(rows2) == [] and off3 == {"tick": 2}

    # deterministic replay from the spool, not the (rotating) endpoint —
    # BIT-identical: fetch_ts_us comes back from the spool filename, so
    # a recovered batch equals the original in every column.
    replayed = list(r.readBetweenOffsets({"tick": 0}, {"tick": 2}))
    assert replayed == [tuple(rows0[0]), tuple(list(rows1_list)[0])]
    assert [p for _, p in replayed] == PAYLOADS[:2]

    # missing spool tick fails loud
    import os

    path0, _ = _find_spool(spool, 0)
    os.remove(path0)
    with pytest.raises(FileNotFoundError):
        list(r.readBetweenOffsets({"tick": 0}, {"tick": 2}))


def test_reader_error_skip_advances_offset(tmp_path):
    """A failed fetch under on_error=skip emits no rows but advances the
    offset with an empty spool marker; on_error=raise propagates."""
    url = "http://127.0.0.1:9/unreachable"  # port 9: connection refused
    spool = str(tmp_path / "spool")
    r = GtfsRtStreamReader(
        {"url": url, "spool_dir": spool, "timeout": "1"}
    )
    rows, off = r.read({"tick": 0})
    assert list(rows) == [] and off == {"tick": 1}
    path0, _ = _find_spool(spool, 0)
    with open(path0, "rb") as f:
        assert f.read() == b""
    # replay of the skipped tick yields nothing (not a crash)
    assert list(r.readBetweenOffsets({"tick": 0}, {"tick": 1})) == []

    strict = GtfsRtStreamReader(
        {"url": url, "spool_dir": spool, "timeout": "1", "on_error": "raise"}
    )
    with pytest.raises(Exception):
        strict.read({"tick": 1})
