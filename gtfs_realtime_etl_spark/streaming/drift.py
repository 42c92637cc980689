"""Streaming distribution-drift monitor (event-time windows vs a
frozen baseline).

The production guardrail a continuously-ingesting training-data
pipeline runs NEXT TO dedup/quality filters: if the incoming data's
feature distribution shifts (a scraper breaks, a source flips format,
an upstream model changes), you want the window that drifted flagged
in-flight — not discovered after a 100 TB epoch is written.

Semantics: for each (event-time window, group) the monitor aggregates
``n`` and the feature mean, then scores the shift against a frozen
baseline (μ, σ) as a standard error z:

    z = (mean_w − μ) / (σ / √n_w)

``drifted = |z| > threshold``.  The baseline is computed ONCE from a
reference corpus by :func:`baseline_stats` (decimal-accumulated mean /
sample-std — engine-exact, same discipline as the registry's
``embedding_standardize``) and broadcast; the stream side is one
watermarked windowed aggregate — the ONLY shuffle — joined to the
tiny baseline table.

One function serves streaming and batch: a batch frame runs the
identical windowed aggregation with no watermark (the backfill twin),
so tests compare the streaming result to the batch result on the same
rows — the same twin pattern as ``streaming/windows.py``.

Scale notes: state is O(open windows × groups) and the watermark
evicts closed windows; the baseline join is a broadcast of |groups|
rows.  Append output mode emits each window exactly once when the
watermark passes its end — alerts are emitted once, when final.

Reference scope: the reference has no monitoring surface; this is a
driver-mandated LLM-pipeline extension (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,12)"


def baseline_stats(
    reference: DataFrame,
    value_col: str = "value",
    group_col: str | None = None,
) -> DataFrame:
    """Frozen per-group (μ, σ) from a reference corpus — decimal-exact
    sums so the baseline is independent of partitioning.  Output:
    (group?, mu, sigma)."""
    keys = [group_col] if group_col else []
    agg = reference.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(F.col(value_col).cast(_DEC)).alias("s"),
        F.sum((F.col(value_col) * F.col(value_col)).cast(_DEC)).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s").cast("double") / nd
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    return agg.select(*keys, mu.alias("mu"), F.sqrt(var).alias("sigma"))


def feature_drift(
    events: DataFrame,
    baseline: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str | None = None,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    z_threshold: float = 4.0,
) -> DataFrame:
    """Windowed drift scores vs the frozen baseline.  Streaming inputs
    get the watermark; batch inputs run the identical aggregation (the
    backfill twin).  Output: (window, group?, n, mean, z, drifted)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    keys = [group_col] if group_col else []
    agg = src.groupBy(F.window(ts_col, window).alias("window"), *keys).agg(
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
    )
    joined = (
        agg.join(F.broadcast(baseline), keys) if keys
        else agg.crossJoin(F.broadcast(baseline))
    )
    z = (F.col("mean") - F.col("mu")) / (
        F.col("sigma") / F.sqrt(F.col("n").cast("double"))
    )
    return joined.select(
        "window",
        *keys,
        "n",
        "mean",
        z.alias("z"),
        (F.abs(z) > F.lit(float(z_threshold))).alias("drifted"),
    )
