"""Streaming CUSUM change-point monitor: planted-shift detection,
micro-batch slicing invariance, and stream == batch-twin equality
(applyInPandasWithState — same API note as streaming/budget.py)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gtfs_realtime_etl_spark.streaming.changepoint import (
    cusum_scan_batch,
    streaming_cusum,
)

SCHEMA = "event_type string, ts long, event_id long, value double"

# Key "shifty": 20 rows at ~5.0, then 20 rows at ~8.0 (a +3 level
# shift).  Key "stable": 40 rows at ~5.0.  mu=5.0, k=0.5, h=4.0 (micro
# units) → the shift accumulates (3.0 − 0.5) per row and must alarm
# within two rows of the change; the stable key never alarms.
MU = 5_000_000
K = 500_000
H = 4_000_000


def _rows():
    rows = []
    rid = 0
    for i in range(40):
        rid += 1
        rows.append(("stable", 1000 + i, rid, 5.0 + (0.1 if i % 2 else -0.1)))
    for i in range(20):
        rid += 1
        rows.append(("shifty", 1000 + i, rid, 5.0 + (0.1 if i % 2 else -0.1)))
    for i in range(20, 40):
        rid += 1
        rows.append(("shifty", 1000 + i, rid, 8.0 + (0.1 if i % 2 else -0.1)))
    return sorted(rows, key=lambda r: (r[1], r[2]))


def _write_slices(tmp_path, rows, n_slices, dirname="cusum_src"):
    src = tmp_path / dirname
    src.mkdir()
    per = (len(rows) + n_slices - 1) // n_slices
    for i in range(n_slices):
        chunk = rows[i * per : (i + 1) * per]
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array([r[0] for r in chunk]),
                    "ts": pa.array([r[1] for r in chunk], pa.int64()),
                    "event_id": pa.array([r[2] for r in chunk], pa.int64()),
                    "value": pa.array([r[3] for r in chunk], pa.float64()),
                }
            ),
            str(src / f"slice_{i}.parquet"),
        )
        # pin mtime order = slice order (FileStreamSource discovery)
        os.utime(
            str(src / f"slice_{i}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    return str(src)


def _run_stream(spark, tmp_path, src, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_cusum(stream, MU, K, H)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.table(name)
        .toPandas()
        .sort_values(["key", "ts", "row_id"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("n_slices", [1, 4])
def test_planted_shift_alarms_and_slicing_invariance(
    spark, tmp_path, n_slices
):
    got = _run_stream(spark, tmp_path, _write_slices(tmp_path, _rows(), n_slices), f"cusum_{n_slices}")
    # the stable key never alarms
    assert not (got["key"] == "stable").any()
    shifty = got[got["key"] == "shifty"]
    assert len(shifty) >= 1
    first = shifty.iloc[0]
    # the shift starts at ts=1020; (3.0−0.5)/row → crosses h=4.0 on the
    # second post-shift row
    assert first["direction"] == "up"
    assert 1020 <= first["ts"] <= 1022
    # restart semantics: repeated alarms as the shifted level persists
    assert (shifty["direction"] == "up").all()


def test_stream_equals_batch_twin_and_chunk_count_invariance(
    spark, tmp_path
):
    rows = _rows()
    a = _run_stream(spark, tmp_path, _write_slices(tmp_path, rows, 1, "src1"), "cusum_tw1")
    b = _run_stream(spark, tmp_path, _write_slices(tmp_path, rows, 4, "src4"), "cusum_tw4")
    pd.testing.assert_frame_equal(a, b)
    batch = (
        cusum_scan_batch(
            spark.createDataFrame([tuple(r) for r in rows], SCHEMA), MU, K, H
        )
        .toPandas()
        .sort_values(["key", "ts", "row_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, batch)
