"""Streaming per-source token budget (applyInPandasWithState — see
streaming/budget.py for why transformWithStateInPandas is unavailable
in this container): cross-batch state, in-flight drop semantics,
retry-stable totals."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.streaming.budget import streaming_token_budget
from tests.conftest import full_suite_only

SCHEMA = "source string, doc_id long, n_tokens long"

# Two sources; web has far more tokens than the budget, books fits.
DOCS = [
    ("web", 1, 40), ("web", 2, 40), ("web", 3, 40), ("web", 4, 40),
    ("web", 5, 40), ("web", 6, 40),
    ("books", 10, 30), ("books", 11, 30),
]
BUDGET = 100


def _write_slices(tmp_path, rows, n_slices):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "docs"
    src.mkdir()
    per = (len(rows) + n_slices - 1) // n_slices
    for i in range(n_slices):
        chunk = rows[i * per : (i + 1) * per]
        pq.write_table(
            pa.table(
                {
                    "source": pa.array([r[0] for r in chunk]),
                    "doc_id": pa.array([r[1] for r in chunk], pa.int64()),
                    "n_tokens": pa.array([r[2] for r in chunk], pa.int64()),
                }
            ),
            str(src / f"slice_{i}.parquet"),
        )
        # FileStreamSource orders files by modification time and breaks
        # ties arbitrarily — pin strictly increasing mtimes so the
        # micro-batch order is the slice order (the property under test
        # is budget-vs-batching, not file-discovery order).
        import os

        os.utime(str(src / f"slice_{i}.parquet"), (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def _run(spark, tmp_path, src, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_token_budget(stream, BUDGET)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas().sort_values("doc_id")


@pytest.mark.parametrize("n_slices", [1, 4])
def test_budget_cap_is_batch_partitioning_invariant(spark, tmp_path, n_slices):
    """The accept set depends only on doc_id order, not on how the
    stream is micro-batched: budget 100 accepts web docs 1,2,3 (total
    120 — the crossing doc is accepted, everything after drops) and
    both books docs (total 60)."""
    src = _write_slices(tmp_path, DOCS, n_slices)
    got = _run(spark, tmp_path, src, f"budget_{n_slices}")
    by_src = {
        s: list(g["doc_id"]) for s, g in got.groupby("source")
    }
    assert by_src == {"web": [1, 2, 3], "books": [10, 11]}
    web = got[got["source"] == "web"]
    assert list(web["source_total"]) == [40, 80, 120]  # running totals
    books = got[got["source"] == "books"]
    assert list(books["source_total"]) == [30, 60]


@full_suite_only  # 53 s (default-lane --durations): 8-trigger state e2e
def test_budget_state_survives_across_batches(spark, tmp_path):
    """With one file per trigger, web's budget is consumed across
    micro-batches — the state store carries the running total, so
    later batches drop everything for the exhausted source."""
    # one doc per slice → 8 micro-batches
    src = _write_slices(tmp_path, DOCS, len(DOCS))
    got = _run(spark, tmp_path, src, "budget_multi")
    assert list(got[got["source"] == "web"]["doc_id"]) == [1, 2, 3]
    assert int(got["n_tokens"].sum()) == 40 * 3 + 30 * 2
