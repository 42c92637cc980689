"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares row count, column names, and
values (columns sorted by name, rows sorted by all columns) — the same
shape as the driver's CORRECTNESS gate, but with diagnostics: exact float
deltas are reported so near-misses (hash-risk) are visible in CI before
the driver sees them.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
import pyarrow as pa
from pyspark.sql import SparkSession

from gtfs_realtime_etl_spark.sources.testdata import TABLES


@dataclass
class ParityResult:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    exact_match: bool
    dtype_match: bool = True
    max_abs_delta: float = 0.0
    notes: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.exact_match
            and self.dtype_match
        )


def run_oracle_arrow(
    sql: str, sf_dir: str, timezone: str = "America/Toronto"
) -> "pa.Table":
    """Execute the oracle SQL once, returning the Arrow Table — both the
    values (``.to_pandas()``) and the ACTUAL Arrow schema the driver
    hashes come from this single execution on one connection."""
    con = duckdb.connect()
    try:
        con.execute(f"SET timezone = '{timezone}'")
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).arrow()
    finally:
        con.close()


def run_oracle(sql: str, sf_dir: str, timezone: str = "America/Toronto") -> pd.DataFrame:
    return run_oracle_arrow(sql, sf_dir, timezone).to_pandas()


# --- driver-visible dtype gate -------------------------------------------
#
# The driver hashes Arrow-level values, where DuckDB's SUM(integer) is
# HUGEINT -> decimal128(38,0) while Spark's is bigint -> int64: bit-equal
# values, different hashes. `.df()` flattens HUGEINT to float64, which is
# exactly what masked this class locally in round 2 (VERDICT r2, item 2).
# So we compare the REAL Arrow schemas both engines produce — DuckDB's
# from the executed result Table, Spark's via its own Arrow conversion
# rules (pyspark.sql.pandas.types.to_arrow_schema, the exact mapping
# toPandas/toArrow applies) — normalizing only integer and string/binary
# widths (the driver passes int32-vs-int64).  Nested types recurse, so a
# struct-vs-map or a differing nested field type is flagged too.


def _norm_arrow_type(t: "pa.DataType") -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return f"timestamp({'tz' if t.tz else 'ntz'})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{_norm_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_norm_arrow_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{_norm_arrow_type(t.key_type)},{_norm_arrow_type(t.item_type)}>"
    return str(t)


def check_dtypes(res: ParityResult, spark_df, oracle_schema: "pa.Schema") -> None:
    """Flag driver-hash-relevant dtype divergence on a ParityResult."""
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_types = {
        f.name: _norm_arrow_type(f.type) for f in to_arrow_schema(spark_df.schema)
    }
    oracle_types = {f.name: _norm_arrow_type(f.type) for f in oracle_schema}
    for col in sorted(set(spark_types) & set(oracle_types)):
        if spark_types[col] != oracle_types[col]:
            res.dtype_match = False
            res.notes.append(
                f"dtype col {col}: spark={spark_types[col]} "
                f"oracle={oracle_types[col]} — driver hash will diverge"
            )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> ParityResult:
    res = ParityResult(
        name=name,
        spark_rows=len(sdf),
        oracle_rows=len(odf),
        columns_match=sorted(sdf.columns) == sorted(odf.columns),
        exact_match=False,
    )
    if not res.columns_match:
        res.notes.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return res
    if res.spark_rows != res.oracle_rows:
        res.notes.append("row-count mismatch")
        return res
    s, o = _canon(sdf), _canon(odf)
    exact = True
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(oc):
            sc = sc.astype("float64")
            oc = oc.astype("float64")
            both_nan = sc.isna() & oc.isna()
            eq = (sc == oc) | both_nan
            if not eq.all():
                exact = False
                delta = (sc - oc).abs().max()
                if not math.isnan(delta):
                    res.max_abs_delta = max(res.max_abs_delta, float(delta))
                res.notes.append(f"float col {c}: {int((~eq).sum())} diffs, max|Δ|={delta}")
        else:
            eq = (sc == oc) | (sc.isna() & oc.isna())
            if not eq.all():
                exact = False
                bad = int((~eq).sum())
                i = (~eq).idxmax()
                res.notes.append(
                    f"col {c}: {bad} diffs, first: spark={sc[i]!r} oracle={oc[i]!r}"
                )
    res.exact_match = exact
    return res


def compare_to_oracle(
    spark: SparkSession, name: str, sf_dir: str
) -> ParityResult:
    from gtfs_realtime_etl_spark.plans.queries import ORACLE_SQL, QUERIES

    q = QUERIES[name](spark, sf_dir)
    sdf = q.toPandas()
    otbl = run_oracle_arrow(ORACLE_SQL[name], sf_dir)
    res = compare_frames(name, sdf, otbl.to_pandas())
    check_dtypes(res, q, otbl.schema)
    return res
