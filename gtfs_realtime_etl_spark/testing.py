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
    max_abs_delta: float = 0.0
    notes: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.exact_match
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

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = run_oracle(ORACLE_SQL[name], sf_dir)
    return compare_frames(name, sdf, odf)
