"""Multimodal column plumbing: schema-faithful decode/resize/frame ops
over binary payloads (stub codecs; the Spark-side batching, schemas,
and fan-out shapes are the real thing under test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.multimodal import (
    extract_features,
    media_stats,
    resize_media,
    sample_frames,
    synthesize_media,
)


def _media(spark, n=20, modality="image"):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} " + "x" * (50 + i)) for i in range(n)],
        "doc_id long, text string",
    )
    return synthesize_media(spark, docs, modality=modality)


def test_extract_features_histogram_sums_to_one(spark):
    media = _media(spark)
    feats = extract_features(media, dim=16).toPandas()
    assert len(feats) == 20
    for _, row in feats.iterrows():
        assert len(row["feature"]) == 16
        assert abs(sum(row["feature"]) - 1.0) < 1e-9  # histogram over all bytes
        assert row["n_bytes"] > 0


def test_resize_media_scales_metadata_and_payload(spark):
    media = _media(spark)
    small = resize_media(media, max_side=64)
    out = small.toPandas().set_index("media_id")
    orig = media.toPandas().set_index("media_id")
    assert list(small.columns) == list(media.columns)  # composable: same schema
    for mid, row in out.iterrows():
        w, h = orig.loc[mid, "width"], orig.loc[mid, "height"]
        stride = max((max(w, h) + 63) // 64, 1)
        assert row["width"] == max(w // stride, 1)
        assert max(row["width"], row["height"]) <= 64 + 1
        assert len(row["payload"]) == len(bytes(orig.loc[mid, "payload"])[::stride])
    # idempotent composition: resizing the resized table is a no-op-ish
    again = resize_media(small, max_side=64).count()
    assert again == 20


def test_sample_frames_fan_out_bounded(spark):
    media = _media(spark, n=30, modality="video")
    frames = sample_frames(media, every_ms=1000, max_frames=8)
    pdf = frames.toPandas()
    per = pdf.groupby("media_id").size()
    assert (per <= 8).all()
    durations = _media(spark, n=30, modality="video").select(
        "media_id", "duration_ms"
    ).toPandas().set_index("media_id")["duration_ms"]
    # zero-duration rows produce no frames; others >= 1
    for mid, dur in durations.items():
        expected = 0 if dur <= 0 else min(max(dur // 1000, 1), 8)
        assert per.get(mid, 0) == expected
    # frame timestamps follow the cadence
    assert (pdf["frame_ms"] == pdf["frame_index"] * 1000).all()
    assert pdf["frame_payload"].map(len).gt(0).all()


def test_media_stats_prunes_payload(spark, tmp_path):
    """media_stats over an at-rest media table must be metadata-only:
    the parquet scan's ReadSchema excludes the binary payload column
    (at 100 TB the payload IS the table — reading it for a profile
    turns a metadata query into a full-lake scan)."""
    import contextlib
    import io
    import re

    path = str(tmp_path / "media")
    _media(spark).write.parquet(path)
    stats_df = media_stats(spark.read.parquet(path))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stats_df.explain("formatted")
    reads = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l]
    assert reads, buf.getvalue()
    read_cols = set(re.findall(r"(\w+):", reads[0].split("struct<")[1]))
    assert "payload" not in read_cols, reads[0]
    assert {"modality", "n_bytes", "width", "height", "duration_ms"} <= read_cols

    stats = stats_df.collect()
    assert stats[0]["n_items"] == 20
    assert stats[0]["avg_bytes"] > 0
