"""Relational + domain operators.

- ``ingest``: raw feed record → enriched lake row (the reference's write
  path as a pure DataFrame→DataFrame transform).
- ``schedule_deviation``: the flagship analytics query (E3).
- ``dedup``: exact, MinHash-LSH, SimHash, n-gram-Jaccard dedup.
- ``similarity``: brute-force + LSH-bucketed cosine ANN.
- ``text``: document quality / language-ID / token statistics.
- ``multimodal``: binary-column decode/feature plumbing (stubbed codecs).
"""

from gtfs_realtime_etl_spark.operators.ingest import enrich_positions
from gtfs_realtime_etl_spark.operators.schedule_deviation import (
    schedule_deviation,
    stop_reliability,
)

__all__ = ["enrich_positions", "schedule_deviation", "stop_reliability"]
