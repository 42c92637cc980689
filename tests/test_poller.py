"""Driver-side HTTP poller: fetch → atomic payload files → decodable
end-to-end (reference handler.py:43-54 parity)."""

from __future__ import annotations

import http.server
import threading

import pytest

from gtfs_realtime_etl_spark.sources.gtfs_rt import encode_feed, parse_feed
from gtfs_realtime_etl_spark.sources.poller import poll_feed, poll_feed_once

PAYLOAD = encode_feed(
    [
        {
            "trip_id": "T1",
            "route_id": "R1",
            "vehicle_id": "V1",
            "latitude": 43.65,
            "longitude": -79.38,
            "timestamp": 1709650800,
        }
    ]
)


@pytest.fixture(scope="module")
def feed_server():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/boom":
                self.send_error(500)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-protobuf")
            self.end_headers()
            self.wfile.write(PAYLOAD)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_poll_feed_once_atomic_decodable(feed_server, tmp_path):
    path = poll_feed_once(feed_server + "/feed.pb", str(tmp_path))
    assert path.endswith(".pb")
    recs = parse_feed(open(path, "rb").read())
    assert recs[0]["vehicle_id"] == "V1"
    assert not list(tmp_path.glob(".*tmp"))  # no half-written leftovers


def test_poll_feed_loop_and_error_skip(feed_server, tmp_path):
    class FakeClock:
        def __init__(self):
            self.t = 1_700_000_000.0
            self.slept = []

        def time(self):
            self.t += 0.001
            return self.t

        def sleep(self, s):
            self.slept.append(s)
            self.t += s

    clock = FakeClock()
    n = poll_feed(
        feed_server + "/feed.pb",
        str(tmp_path),
        interval_seconds=30,
        max_ticks=3,
        clock=clock,
    )
    assert n == 3
    assert len(list(tmp_path.glob("*.pb"))) == 3
    assert len(clock.slept) == 2  # no sleep after the final tick
    assert all(29 < s <= 30 for s in clock.slept)

    # failing endpoint: skip mode keeps looping, raise mode propagates
    assert poll_feed(feed_server + "/boom", str(tmp_path), max_ticks=2, clock=clock) == 0
    with pytest.raises(Exception):
        poll_feed(
            feed_server + "/boom",
            str(tmp_path),
            max_ticks=1,
            on_error="raise",
            clock=clock,
        )
