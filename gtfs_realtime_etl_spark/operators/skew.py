"""Skew mitigation utilities.

First line of defense is AQE (on by default in session.py: skew-join
splitting rewrites oversized sort-merge partitions at runtime).  These
helpers cover the cases AQE does not reach:

- :func:`salted_join` — broadcast-ineligible equi joins where a handful
  of hot keys melt one reducer.  The big side gets a deterministic salt
  in [0, salt); the small side is exploded across every salt value, so
  each hot key fans out over ``salt`` reducers.  Join semantics are
  unchanged (inner/left); the small side grows ×salt — keep salt modest
  and the small side small.
- :func:`salted_distinct_agg` — two-phase aggregation for per-key state
  explosions (e.g. collect_set on a hot key): partial aggregate on
  (key, salt), then merge per key.  Catalyst's map-side partial
  aggregation already handles sums/counts; this is for set-like states
  whose partial states are themselves big.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the large side.

    The salt is derived from a hash of the large side's whole row (so
    rows sharing a hot key still scatter); the small side is replicated
    once per salt value.  Result columns match ``large.join(small, on,
    how)``.  Only large-side-preserving joins are valid: a right/full
    outer join would surface each unmatched small-side row once PER
    REPLICA (×salt duplicates), so those modes are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join supports large-side-preserving joins only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows in "
            "right/full outer modes"
        )
    lcols = [F.col(c) for c in large.columns]
    lsalt = large.withColumn("_salt", F.pmod(F.xxhash64(*lcols), F.lit(salt)))
    ssalt = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt)]))
    )
    out = lsalt.join(ssalt, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_distinct_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt: int = 16,
    agg: str = "collect_set",
) -> DataFrame:
    """Two-phase set aggregation: (key, salt) partials → per-key merge.
    Returns (key, values array sorted distinct, n_distinct)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt))
    )
    agg_fn: Column = getattr(F, agg)(value_col)
    partial = salted.groupBy(key_col, "_salt").agg(agg_fn.alias("_part"))
    return (
        partial.groupBy(key_col)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_part")))
            ).alias("values")
        )
        .withColumn("n_distinct", F.size("values"))
    )
