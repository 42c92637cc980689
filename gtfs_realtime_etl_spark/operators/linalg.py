"""Distributed dense linear algebra over embedding columns.

``gram_matrix`` is the 100 TB fast path behind the registry's
decimal-exact ``embedding_covariance`` query: instead of exploding the
upper triangle (×d(d+1)/2 rows) and decimal-summing per (i, j) group,
each partition folds its vectors into ONE d×d float64 partial Gram
with a vectorized ``X.T @ X`` (Arrow batch → numpy), and the partials
— one tiny d×d array per partition — reduce in a single ≤d(d+1)/2-row
aggregate.  Network traffic is partitions × d², independent of row
count; the corpus is scanned once and never shuffled.

Trade-off, stated plainly: float accumulation is NOT associative, so
results can differ in the last ulps across partitionings — this path
is for throughput (monitoring, whitening, PCA input at scale); the
registry query is the bit-exact, oracle-gated twin.  Parity between
the two is pinned at 1e-9 relative tolerance by tests/test_linalg.py.

Reference scope: the reference has no linear-algebra surface; this is
a driver-mandated LLM-pipeline extension (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Upper-triangle second-moment matrix: (i, j, n, sxy) with
    1-based ``i <= j``, ``sxy = Σ x_i·x_j`` over all vectors, and ``n``
    the vector count — the same contract as the decimal query before
    the mean correction.  ``dim`` pins the width when the caller knows
    it (skips inferring from the first batch)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: np.ndarray | None = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = mat.T @ mat if acc is None else acc + mat.T @ mat
            n += mat.shape[0]
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": iu + 1,
                "j": ju + 1,
                "n_part": np.full(iu.shape[0], n, dtype=np.int64),
                "sxy_part": acc[iu, ju],
            }
        )

    partials = embeddings.select(vec_col).mapInPandas(
        fold, schema="i int, j int, n_part long, sxy_part double"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("n_part").alias("n"), F.sum("sxy_part").alias("sxy")
    )


def covariance_matrix(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Mean-corrected covariance from :func:`gram_matrix` partials:
    cov(i,j) = S_ij/n − (S_i/n)(S_j/n).  The per-dim sums S_i are read
    off the Gram's diagonal-row pairs (i, j=i is x_i², not S_i), so a
    second tiny pass collects them: the diagonal trick doesn't apply —
    instead reuse the same partial-fold for the first moments."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: np.ndarray | None = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = mat.sum(axis=0) if acc is None else acc + mat.sum(axis=0)
            n += mat.shape[0]
        if acc is None:
            return
        yield pd.DataFrame(
            {
                "d": np.arange(1, acc.shape[0] + 1),
                "n_part": np.full(acc.shape[0], n, dtype=np.int64),
                "s_part": acc,
            }
        )

    sums = (
        embeddings.select(vec_col)
        .mapInPandas(fold, schema="d int, n_part long, s_part double")
        .groupBy("d")
        .agg(F.sum("s_part").alias("s"))
    )
    gram = gram_matrix(embeddings, vec_col)
    nd = F.col("n").cast("double")
    cov = (
        F.col("sxy") / nd
        - (F.col("si") / nd) * (F.col("sj") / nd)
    )
    return (
        gram.join(
            F.broadcast(sums.select(F.col("d").alias("i"), F.col("s").alias("si"))),
            "i",
        )
        .join(
            F.broadcast(sums.select(F.col("d").alias("j"), F.col("s").alias("sj"))),
            "j",
        )
        .select("i", "j", "n", cov.alias("cov"))
    )
