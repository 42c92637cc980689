"""Bit-identity pin for the SQL-parsed dot-fold text (round-12).

``sql_dot_fold`` (functions/vector.py) is the parsed twin of the
``dot`` Column builder — q_semantic_decontam assembles its
per-benchmark cosines from this text instead of paying a py4j round
trip per expression node.  The contract is EXACT bit equality with
the Column form on every input, so this test compares raw doubles
with ``==`` over random vectors, zero vectors, NULL elements, and
float32 inputs (the cast-inside-the-fold discipline).
"""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.functions.vector import dot, sql_dot_fold


def _bits(x):
    return None if x is None else struct.pack("<d", x)


def _mk_rows(dim: int, n: int, seed: int):
    rng = random.Random(seed)
    rows = [
        (
            i,
            [rng.uniform(-2, 2) for _ in range(dim)],
            [rng.uniform(-2, 2) for _ in range(dim)],
        )
        for i in range(n)
    ]
    rows.append((n, [0.0] * dim, [1.0] * dim))
    na = [1.0] * dim
    na[dim // 2] = None
    rows.append((n + 1, na, [1.0] * dim))
    return rows


def _assert_bit_equal(df):
    for r in df.select(
        F.expr(sql_dot_fold("a", "b")).alias("s"),
        dot(F.col("a"), F.col("b")).alias("t"),
    ).collect():
        assert _bits(r["s"]) == _bits(r["t"]), (r["s"], r["t"])


def test_sql_dot_fold_bit_equal_doubles(spark):
    df = spark.createDataFrame(
        _mk_rows(64, 40, seed=1), "id long, a array<double>, b array<double>"
    )
    _assert_bit_equal(df)


def test_sql_dot_fold_bit_equal_float32(spark):
    def f32(xs):
        return [
            None
            if x is None
            else float(struct.unpack("<f", struct.pack("<f", x))[0])
            for x in xs
        ]

    df = spark.createDataFrame(
        [(i, f32(a), f32(b)) for i, a, b in _mk_rows(64, 20, seed=7)],
        "id long, a array<float>, b array<float>",
    )
    _assert_bit_equal(df)
