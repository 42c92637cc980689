"""Deterministic GTFS fixture generator (FIXTURES.md).

Synthesizes the semantic-parity corpus: GTFS static CSVs + raw vehicle
positions engineered so every clause of the flagship query bites
(spatial matches exist, dedup groups have multiplicity with distinct
|diff|, deviations straddle the band, past-midnight rows exist, nulls
sprinkled, ≥2 day partitions)."""

from __future__ import annotations

import os
import zoneinfo
from dataclasses import dataclass
from datetime import datetime

import numpy as np
import pandas as pd

SEED = 42
TZ = "America/Toronto"
DAYS = ("2024-03-05", "2024-03-06")
RADIUS = 0.0002


@dataclass
class GtfsFixtures:
    gtfs_dir: str
    raw_positions: pd.DataFrame  # VEHICLE_POSITIONS_RAW schema


def _fmt_time(secs: int) -> str:
    return f"{secs // 3600:02d}:{secs % 3600 // 60:02d}:{secs % 60:02d}"


def generate(base_dir: str) -> GtfsFixtures:
    rng = np.random.default_rng(SEED)
    gtfs_dir = os.path.join(base_dir, "gtfs")
    os.makedirs(gtfs_dir, exist_ok=True)

    # routes: types 3/700 kept by the flagship filter, 1/2 excluded.
    n_routes = 20
    routes = pd.DataFrame(
        {
            "route_id": [f"R{i:02d}" for i in range(n_routes)],
            "route_short_name": [f"{100 + i}" for i in range(n_routes)],
            "route_type": [(3, 700, 1, 2)[i % 4] for i in range(n_routes)],
        }
    )

    n_trips = 120
    trips = pd.DataFrame(
        {
            "trip_id": [f"T{i:03d}" for i in range(n_trips)],
            "route_id": rng.choice(routes["route_id"], n_trips),
            "service_id": "WEEKDAY",
            "direction_id": rng.integers(0, 2, n_trips),
            "shape_id": [f"SH{i % 40:02d}" for i in range(n_trips)],
        }
    )

    n_stops = 150
    stops = pd.DataFrame(
        {
            # numeric-looking ids exercise the VARCHAR override
            "stop_id": [str(10000 + i) for i in range(n_stops)],
            "stop_name": [f"Stop {i}" for i in range(n_stops)],
            "stop_lat": rng.uniform(43.60, 43.80, n_stops).round(6),
            "stop_lon": rng.uniform(-79.60, -79.20, n_stops).round(6),
        }
    )

    # stop_times: ~10 stops per trip on a 6:00-22:00 grid; ~3% of rows
    # get past-midnight hours (24-35) to exercise the exclusion regex.
    st_rows = []
    for t in trips.itertuples():
        k = int(rng.integers(8, 13))
        stop_idx = rng.choice(n_stops, k, replace=False)
        start = int(rng.integers(6 * 3600, 20 * 3600))
        for seq, si in enumerate(stop_idx, start=1):
            secs = start + seq * 120
            # Real GTFS past-midnight times stay under 36:00:00 (the
            # reference regex excludes exactly hours 24-35); only early
            # starts can wrap without leaving that band.
            if rng.random() < 0.12 and secs < 11 * 3600:
                secs += 24 * 3600  # "25:10:00"-style
            st_rows.append(
                {
                    "trip_id": t.trip_id,
                    "arrival_time": _fmt_time(secs),
                    "departure_time": _fmt_time(secs + 15),
                    "stop_id": stops["stop_id"].iloc[si],
                    "stop_sequence": seq,
                }
            )
    stop_times = pd.DataFrame(st_rows)

    shapes = pd.DataFrame(
        {
            "shape_id": [f"SH{i % 40:02d}" for i in range(2000)],
            "shape_pt_lat": rng.uniform(43.60, 43.80, 2000).round(6),
            "shape_pt_lon": rng.uniform(-79.60, -79.20, 2000).round(6),
            "shape_pt_sequence": np.tile(np.arange(50), 40),
        }
    )

    for name, df in (
        ("routes", routes),
        ("trips", trips),
        ("stops", stops),
        ("stop_times", stop_times),
        ("shapes", shapes),
    ):
        df.to_csv(os.path.join(gtfs_dir, f"{name}.txt"), index=False)

    # raw positions: engineered matches around scheduled stop events.
    tz = zoneinfo.ZoneInfo(TZ)
    day_epochs = [
        int(datetime.fromisoformat(d).replace(tzinfo=tz).timestamp()) for d in DAYS
    ]
    stop_lookup = stops.set_index("stop_id")
    pos_rows = []
    vehicle_ids = [f"V{i:03d}" for i in range(200)]
    for st in stop_times.itertuples():
        h = int(st.arrival_time[:2])
        if h >= 24:
            continue  # past-midnight events get no pings
        arrival_secs = h * 3600 + int(st.arrival_time[3:5]) * 60 + int(st.arrival_time[6:8])
        srow = stop_lookup.loc[st.stop_id]
        for day_epoch in day_epochs:
            if rng.random() > 0.6:
                continue
            n_pings = int(rng.integers(1, 4))
            mags = rng.choice(np.arange(1, 900), n_pings, replace=False)
            signs = rng.choice([-1, 1], n_pings)
            for mag, sign in zip(mags, signs):
                diff = int(mag) * int(sign)
                r = rng.uniform(0, RADIUS * 0.7)
                theta = rng.uniform(0, 2 * np.pi)
                pos_rows.append(
                    {
                        "trip_id": st.trip_id,
                        "route_id": None,
                        "direction_id": str(int(rng.integers(0, 2))),
                        "vehicle_id": vehicle_ids[int(rng.integers(0, 200))],
                        "latitude": float(srow.stop_lat + r * np.sin(theta)),
                        "longitude": float(srow.stop_lon + r * np.cos(theta)),
                        "bearing": float(rng.uniform(0, 360)),
                        "speed": float(rng.uniform(0, 30)),
                        "timestamp": day_epoch + arrival_secs + diff,
                    }
                )

    # noise pings: far from any stop, some with NULL trip_id.
    for _ in range(1500):
        null_trip = rng.random() < 0.3
        pos_rows.append(
            {
                "trip_id": None if null_trip else f"T{int(rng.integers(0, n_trips)):03d}",
                "route_id": None,
                "direction_id": None,
                "vehicle_id": vehicle_ids[int(rng.integers(0, 200))],
                "latitude": float(rng.uniform(42.0, 43.0)),  # outside stop bbox
                "longitude": float(rng.uniform(-81.0, -80.0)),
                "bearing": float(rng.uniform(0, 360)),
                "speed": float(rng.uniform(0, 30)),
                "timestamp": int(day_epochs[0] + rng.integers(0, 2 * 86400)),
            }
        )

    raw = pd.DataFrame(pos_rows)
    raw["route_id"] = raw["trip_id"].map(
        dict(zip(trips["trip_id"], trips["route_id"]))
    )
    return GtfsFixtures(gtfs_dir=gtfs_dir, raw_positions=raw)
