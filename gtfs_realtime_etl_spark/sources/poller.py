"""Driver-side GTFS-RT HTTP poller.

The reference fetches the agency feed with an HTTP GET inside its
lambda (etl/runtime/handler.py:43-54) on an EventBridge/Step Functions
cadence.  In this engine the cadence lives in Structured Streaming
(streaming/ingest.py) and the poller is deliberately a thin driver-side
helper OUTSIDE the Spark graph: it lands each fetched FeedMessage as
one payload file in the directory ``start_feed_file_stream`` watches
(or, in the Kafka deployment, a producer replaces it entirely).

stdlib-only (urllib); writes are atomic (tmp file + rename) so the
file-stream source never observes a half-written payload.
"""

from __future__ import annotations

import itertools
import os
import time
import urllib.request

#: Process-wide tick counter: two fetches in the same clock microsecond
#: (concurrent pollers, coarse clocks) must not collide on a filename —
#: os.replace would silently clobber the earlier payload.
_seq = itertools.count()


def poll_feed_once(
    url: str,
    out_dir: str,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
    clock=time,
) -> str:
    """One fetch: GET ``url``, write the bytes atomically as a
    timestamped ``.pb`` file under ``out_dir``.  Returns the path."""
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = resp.read()
    os.makedirs(out_dir, exist_ok=True)
    ts = clock.time()
    name = (
        f"feed_{int(ts)}_{int((ts % 1) * 1e6):06d}"
        f"_{os.getpid()}_{next(_seq):06d}.pb"
    )
    tmp = os.path.join(out_dir, f".{name}.tmp")
    final = os.path.join(out_dir, name)
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, final)  # atomic on POSIX: readers see all or nothing
    return final


def poll_feed(
    url: str,
    out_dir: str,
    interval_seconds: float = 30.0,
    max_ticks: int | None = None,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
    on_error: str = "skip",
    clock=time,
) -> int:
    """Fetch ``url`` every ``interval_seconds`` (the reference's
    sub-minute SFN loop, construct.py:26-110), writing one payload file
    per tick.  ``max_ticks`` bounds the loop (None = forever);
    ``on_error="skip"`` logs-and-continues on fetch failures (the
    at-least-once posture), ``"raise"`` propagates.  Returns the number
    of successful fetches."""
    ok = 0
    tick = 0
    while max_ticks is None or tick < max_ticks:
        start = clock.time()
        try:
            poll_feed_once(url, out_dir, timeout, headers, clock)
            ok += 1
        except Exception:
            if on_error == "raise":
                raise
        tick += 1
        if max_ticks is not None and tick >= max_ticks:
            break
        elapsed = clock.time() - start
        if elapsed < interval_seconds:
            clock.sleep(interval_seconds - elapsed)
    return ok
