"""Pin the engine-exact ROUND idiom used across every plan bank.

Spark's native ``ROUND(x, n)`` on DOUBLE rounds the exact binary
expansion of x (BigDecimal HALF_UP), while DuckDB's ``round(x, n)``
evaluates ``round(x * 10^n) / 10^n`` in IEEE doubles — the two
disagree whenever ``x * 10^n`` lands within its floating-point error
of a half-boundary (measured: ~0.4% of adversarially chosen inputs,
~1e-6 of uniform ones at cents magnitudes — r8's external hash gate
hit this class).  The repo therefore NEVER emits Spark-native
ROUND-on-double in a cross-engine-compared column; every site uses
the mult-form ``ROUND(x * 10^n, 0) / 10^n``, which this test pins
bit-identical to DuckDB's round across magnitudes, signs, and
ULP-perturbed half-boundary inputs:

- Spark ``ROUND(y, 0)`` (BigDecimal HALF_UP on the exact expansion)
  == C ``round(y)`` (half away from zero) for every double y, and
- both engines then share the same IEEE multiply/divide.

The oracle SQL keeps DuckDB's mult-form spelled out too, which is a
semantic no-op there (pinned below).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

duckdb = pytest.importorskip("duckdb")


def _fuzz(n_per: int = 50_000) -> np.ndarray:
    rng = np.random.default_rng(2024)
    chunks = []
    # ULP-perturbed half-boundaries at digit 6 across magnitudes.
    for mag in (1.0, 1e3, 1e6):
        k = rng.integers(0, 10**12, n_per)
        base = (k.astype(np.float64) + 0.5) / 1e6 * mag
        for _ in range(3):
            chunks.append(base)
            base = np.nextafter(base, np.inf)
        base = (k.astype(np.float64) + 0.5) / 1e6 * mag
        for _ in range(3):
            base = np.nextafter(base, -np.inf)
            chunks.append(base)
    for mag in (1e-6, 1.0, 1e3, 1e9, 1e12):
        chunks.append(rng.random(n_per) * mag)
    chunks.append(-rng.random(n_per) * 1e3)
    x = np.concatenate(chunks)
    return x[np.isfinite(x)]


def test_mult_form_round_is_bit_identical_to_duckdb(spark, tmp_path):
    x = _fuzz()
    p = str(tmp_path / "x.parquet")
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": x}), p)

    d = duckdb.sql(
        f"SELECT round(x, 6) AS r6, round(x, 9) AS r9 FROM '{p}'"
    ).arrow()
    s = (
        spark.read.parquet(p)
        .selectExpr(
            "ROUND(x * 1e6, 0) / 1e6 AS m6",
            "ROUND(x * 1e9, 0) / 1e9 AS m9",
        )
        .toPandas()
    )
    for duck_col, spark_col in (("r6", "m6"), ("r9", "m9")):
        dv = d[duck_col].to_numpy().view(np.int64)
        sv = s[spark_col].to_numpy().view(np.int64)
        neq = int((dv != sv).sum())
        assert neq == 0, f"{spark_col}: {neq} bit-diffs of {len(dv)}"


def test_duckdb_mult_form_is_native_round(tmp_path):
    """The oracle rewrite ROUND(E, n) -> ROUND((E)*1eN, 0)/1eN is a
    no-op on the DuckDB side (so oracle semantics are unchanged)."""
    x = _fuzz(20_000)
    import pyarrow.parquet as pq

    p = str(tmp_path / "x.parquet")
    pq.write_table(pa.table({"x": x}), p)
    d = duckdb.sql(
        f"""SELECT round(x, 6) AS a6, round((x) * 1e6, 0) / 1e6 AS b6,
                   round(x, 9) AS a9, round((x) * 1e9, 0) / 1e9 AS b9,
                   round(x) AS a0, round(x, 0) AS b0
            FROM '{p}'"""
    ).arrow()
    for a, b in (("a6", "b6"), ("a9", "b9"), ("a0", "b0")):
        av = d[a].to_numpy().view(np.int64)
        bv = d[b].to_numpy().view(np.int64)
        assert int((av != bv).sum()) == 0


def test_spark_round0_matches_c_round(spark, tmp_path):
    """Spark ROUND(y, 0) == C round(y) (half away from zero) for every
    double — the keystone of the mult-form identity."""
    x = _fuzz(20_000)
    import pyarrow.parquet as pq

    p = str(tmp_path / "x.parquet")
    pq.write_table(pa.table({"x": x}), p)
    s = (
        spark.read.parquet(p)
        .selectExpr("x", "ROUND(x, 0) AS r")
        .toPandas()
    )
    # C round(x) without the classic floor(x+0.5) bug: for |x| < 2^52
    # the fractional part x - trunc(x) is EXACT in IEEE, so comparing
    # it to 0.5 reproduces round-half-away-from-zero bit-for-bit.
    xv = s["x"].to_numpy()
    t = np.trunc(xv)
    frac = xv - t
    expect = t + np.where(np.abs(frac) >= 0.5, np.copysign(1.0, xv), 0.0)
    got = s["r"].to_numpy()
    assert int((expect.view(np.int64) != got.view(np.int64)).sum()) == 0
