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


def run_oracle(sql: str, sf_dir: str, timezone: str = "America/Toronto") -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.execute(f"SET timezone = '{timezone}'")
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).df()
    finally:
        con.close()


# --- driver-visible dtype gate -------------------------------------------
#
# The driver hashes Arrow-level values, where DuckDB's SUM(integer) is
# HUGEINT -> decimal128(38,0) while Spark's is bigint -> int64: bit-equal
# values, different hashes. `.df()` flattens HUGEINT to float64, which is
# exactly what masked this class locally in round 2 (VERDICT r2, item 2).
# So we compare *un-normalized* type classes: Spark schema mapped through
# its Arrow conversion rules vs DuckDB `DESCRIBE <sql>` (binds only, no
# execution). Integer widths unify (the driver passes int32-vs-int64) but
# decimal/int/float/string are distinct classes.

def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp(ntz)"
    if isinstance(dt, T.TimestampType):
        return "timestamp(tz)"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_type_class(dt.elementType)}>"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "complex"
    return dt.simpleString()


_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_type_class(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"list<{_duck_type_class(t[:-2])}>"
    u = t.upper()
    if u in _DUCK_INT:
        return "int"
    if u in ("HUGEINT", "UHUGEINT"):
        # DuckDB surfaces 128-bit ints as decimal128(38,0) in Arrow.
        return "decimal(38,0)"
    if u.startswith("DECIMAL"):
        inner = t[t.index("(") + 1 : t.rindex(")")].replace(" ", "")
        return f"decimal({inner})"
    if u in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if u in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if u in ("BLOB", "BYTEA"):
        return "binary"
    if u == "BOOLEAN":
        return "bool"
    if u == "TIMESTAMP WITH TIME ZONE" or u == "TIMESTAMPTZ":
        return "timestamp(tz)"
    if u.startswith("TIMESTAMP"):
        return "timestamp(ntz)"
    if u == "DATE":
        return "date"
    if u.startswith(("STRUCT", "MAP", "UNION")):
        return "complex"
    return t


def oracle_described_types(
    sql: str, sf_dir: str, timezone: str = "America/Toronto"
) -> dict[str, str]:
    """Column -> DuckDB type name for the oracle SQL, without executing it."""
    con = duckdb.connect()
    try:
        con.execute(f"SET timezone = '{timezone}'")
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        return {r[0]: r[1] for r in rows}
    finally:
        con.close()


def check_dtypes(res: ParityResult, spark_df, oracle_types: dict[str, str]) -> None:
    """Flag driver-hash-relevant dtype divergence on a ParityResult."""
    spark_types = {f.name: _spark_type_class(f.dataType) for f in spark_df.schema.fields}
    for col in sorted(set(spark_types) & set(oracle_types)):
        s_cls = spark_types[col]
        o_cls = _duck_type_class(oracle_types[col])
        if s_cls != o_cls:
            res.dtype_match = False
            res.notes.append(
                f"dtype col {col}: spark={s_cls} oracle={o_cls} "
                f"(duckdb {oracle_types[col]}) — driver hash will diverge"
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
    odf = run_oracle(ORACLE_SQL[name], sf_dir)
    res = compare_frames(name, sdf, odf)
    check_dtypes(res, q, oracle_described_types(ORACLE_SQL[name], sf_dir))
    return res
