"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payloads with typed metadata structs,
processed through Arrow-batched ``mapInPandas`` — the Spark-side schema,
partitioning, batch shape, and UDF signatures are real and tested; the
actual codecs (PIL/ffmpeg/librosa are not in this container) are STUBBED
behind :data:`DECODERS` with a deterministic fake, clearly marked.

At scale the pattern is: binary payloads live in parquet next to their
metadata; decode/feature-extract runs as a narrow mapInPandas over
size-capped batches (``spark.sql.execution.arrow.maxRecordsPerBatch``),
so one poisonous 4 GB video can't blow an executor's Arrow buffer.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Media row schema: payload + typed metadata.  ``n_bytes`` (the payload
#: size) is PERSISTED METADATA stamped at ingest/synthesis: profiling
#: queries aggregate it instead of ``length(payload)``, so a stats scan
#: over a 100 TB media lake prunes the binary column entirely.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB codec: deterministic feature from payload bytes.

    Real deployments replace this with PIL/librosa/ffmpeg decode; the
    libraries are absent in this container (SURVEY/driver mandate), so a
    byte-histogram stands in.  Deterministic: same payload → same vector.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(dim)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    return hist / max(len(arr), 1)


def _unavailable(modality: str) -> Callable[[bytes], np.ndarray]:
    def _raise(payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"real {modality} decoding requires codec libraries not present "
            "in this environment; use the deterministic stub (default)"
        )

    return _raise


#: Pluggable codec registry.  Default: the deterministic stub.
DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """payload binary → fixed-dim feature vector via Arrow-batched
    mapInPandas.  Narrow; batch size bounded by Arrow settings."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                DECODERS.get(m, _fake_decode)(p, dim).tolist()
                for m, p in zip(pdf["modality"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: payload binary → payload binary with updated
    width/height metadata, via Arrow-batched mapInPandas (same schema in
    and out, so it composes anywhere in a media pipeline).

    STUB transform (no PIL in this container): the "resized" payload is
    a deterministic byte subsampling with stride ceil(max(w,h)/max_side)
    — shape-faithful (output length shrinks by the stride, metadata
    scales exactly as a real resize would), so tests exercise real batch
    plumbing and the codec swap-in point is one function.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            new_payload, new_w, new_h = [], [], []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                # NULL metadata stays NULL ("unknown dimension" must not
                # become "0 pixels"); unknown dims resize with stride 1.
                w = None if pd.isna(w) else int(w)
                h = None if pd.isna(h) else int(h)
                side = max(w or 0, h or 0)
                stride = max((side + max_side - 1) // max_side, 1)
                new_payload.append(None if p is None else bytes(p)[::stride])
                new_w.append(None if w is None else max(w // stride, 1))
                new_h.append(None if h is None else max(h // stride, 1))
            out["payload"] = new_payload
            # n_bytes metadata tracks the rewritten payload
            out["n_bytes"] = pd.array(
                [None if p is None else len(p) for p in new_payload], dtype="Int64"
            )
            out["width"] = pd.array(new_w, dtype="Int32")
            out["height"] = pd.array(new_h, dtype="Int32")
            yield out

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


#: Rows produced by frame sampling: one row per sampled frame.
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ms", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one input row fans out to
    ≤ ``max_frames`` frame rows at a fixed cadence — the 1→N mapInPandas
    shape a real ffmpeg-backed sampler uses (and the row-explosion the
    Arrow batch size cap protects against).

    STUB decode: frame bytes are deterministic equal-length slices of
    the payload; a real deployment swaps the slicer for a demuxer.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if p is None or dur is None or int(dur) <= 0:
                    continue
                p = bytes(p)
                n = min(max(int(dur) // every_ms, 1), max_frames)
                step = max(len(p) // n, 1)
                for i in range(n):
                    rows.append(
                        (int(mid), i, i * every_ms, p[i * step : (i + 1) * step])
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_index", "frame_ms", "frame_payload"],
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only profile: aggregates the PERSISTED ``n_bytes``
    metadata column, never ``length(payload)`` — so the scan's
    ReadSchema excludes the heavy binary column and a 100 TB media lake
    profiles at metadata cost (pinned by
    tests/test_multimodal.py::test_media_stats_prunes_payload)."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg("n_bytes").alias("avg_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def synthesize_media(spark, documents: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents corpus —
    test/bench input for the plumbing above (no real codecs needed)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("payload"),
        # payload size stamped as metadata at synthesis ("ingest time"),
        # so profiling never needs the binary column
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.lit(f"{modality}/fake").alias("mime"),
        (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        (F.col("doc_id") % 60000).cast("int").alias("duration_ms"),
    )
