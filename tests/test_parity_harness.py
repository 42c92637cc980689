"""The local parity harness must reproduce the DRIVER's comparison, not
a softened one: round 2 shipped 4 driver-hash failures that the local
harness called green because it normalized dtypes before comparing
(VERDICT r2 item 2).  These tests pin the gate red on exactly that bug
class, using the real Arrow schemas from both engines."""

from __future__ import annotations

from tests.conftest import SF_CORRECTNESS

from gtfs_realtime_etl_spark.testing import (
    ParityResult,
    check_dtypes,
    compare_frames,
    run_oracle_arrow,
)


def _blank(name: str) -> ParityResult:
    return ParityResult(
        name=name, spark_rows=0, oracle_rows=0, columns_match=True, exact_match=True
    )


def test_uncast_integer_sum_flags_dtype_divergence(spark):
    """DuckDB SUM(integer) is HUGEINT → Arrow decimal128(38,0); Spark's
    is bigint → int64.  Bit-equal values — the driver hash still
    diverges, and the gate must say so."""
    otbl = run_oracle_arrow(
        "SELECT l_returnflag, SUM(l_linenumber) AS s FROM lineitem GROUP BY 1",
        SF_CORRECTNESS,
    )
    sdf = spark.sql("SELECT 'A' AS l_returnflag, CAST(1 AS BIGINT) AS s")
    res = _blank("uncast_sum")
    check_dtypes(res, sdf, otbl.schema)
    assert not res.dtype_match
    assert any("decimal(38,0)" in n for n in res.notes)

    # the cast version is green
    otbl2 = run_oracle_arrow(
        "SELECT l_returnflag, CAST(SUM(l_linenumber) AS BIGINT) AS s "
        "FROM lineitem GROUP BY 1",
        SF_CORRECTNESS,
    )
    res2 = _blank("cast_sum")
    check_dtypes(res2, sdf, otbl2.schema)
    assert res2.dtype_match


def test_nested_types_recurse(spark):
    """Struct-vs-map and differing nested field types must not pass the
    gate (ADVICE r3: both previously collapsed to one 'complex' class)."""
    otbl = run_oracle_arrow("SELECT {'a': 1.5::DOUBLE} AS v", SF_CORRECTNESS)
    # Spark: struct with an int field where the oracle has a float field
    sdf_intfield = spark.sql("SELECT named_struct('a', 1) AS v")
    res = _blank("nested_field_type")
    check_dtypes(res, sdf_intfield, otbl.schema)
    assert not res.dtype_match

    sdf_map = spark.sql("SELECT map('a', 1.5d) AS v")
    res2 = _blank("struct_vs_map")
    check_dtypes(res2, sdf_map, otbl.schema)
    assert not res2.dtype_match

    sdf_ok = spark.sql("SELECT named_struct('a', 1.5d) AS v")
    res3 = _blank("struct_ok")
    check_dtypes(res3, sdf_ok, otbl.schema)
    assert res3.dtype_match


def test_int_width_normalizes(spark):
    """int32 vs int64 passes (the driver passes it too)."""
    otbl = run_oracle_arrow("SELECT CAST(1 AS INTEGER) AS v", SF_CORRECTNESS)
    sdf = spark.sql("SELECT CAST(1 AS BIGINT) AS v")
    res = _blank("int_width")
    check_dtypes(res, sdf, otbl.schema)
    assert res.dtype_match


def test_compare_frames_still_value_exact():
    """The value comparison itself stays bit-exact (floats compared with
    == after widening, not approx)."""
    import pandas as pd

    a = pd.DataFrame({"x": [1.0, 2.0]})
    b = pd.DataFrame({"x": [1.0, 2.0 + 1e-12]})
    res = compare_frames("delta", a, b)
    assert not res.exact_match and res.max_abs_delta > 0
