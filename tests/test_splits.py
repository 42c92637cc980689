"""Deterministic split/sample operators (operators/splits.py): the
properties a training pipeline depends on — reproducibility under
repartitioning, subset monotonicity of nested fractions, full coverage
of split assignment, and bit-parity with the DuckDB twins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.functions.hashing import MOD
from gtfs_realtime_etl_spark.operators.splits import (
    split_assign,
    split_slot,
    sql_split_assign,
    sql_split_slot,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    # adversarial ids: 0, negatives, > MOD, near int64 edge
    vals = [0, 1, 2, MOD - 1, MOD, MOD + 1, 10**12, 2**62, -5, -(10**10)]
    vals += list(range(100, 1100))
    return spark.createDataFrame([(v,) for v in vals], "doc_id long")


def test_slot_matches_duckdb_on_adversarial_ids(spark, ids):
    got = {
        r.doc_id: r.slot
        for r in ids.select("doc_id", split_slot(F.col("doc_id")).alias("slot")).collect()
    }
    con = duckdb.connect()
    for doc_id in got:
        (exp,) = con.execute(
            f"SELECT {sql_split_slot(str(doc_id))}"
        ).fetchone()
        assert got[doc_id] == exp, f"id={doc_id}"
        assert 0 <= got[doc_id] < MOD


def test_split_assign_covers_every_row_and_matches_sql(spark, ids):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = split_assign(ids, splits).collect()
    assert all(r.split in splits for r in rows)
    con = duckdb.connect()
    for r in rows:
        (exp,) = con.execute(
            f"SELECT {sql_split_assign(str(r.doc_id), splits)}"
        ).fetchone()
        assert r.split == exp

    # fractions roughly respected on the bulk range
    n = len(rows)
    n_train = sum(r.split == "train" for r in rows)
    assert 0.7 < n_train / n < 0.9


def test_split_fractions_must_sum_to_one(spark, ids):
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(ids, {"train": 0.5, "val": 0.1})


def test_sample_deterministic_under_repartition(spark, ids):
    a = {r.doc_id for r in stratified_sample(ids, 0.3).collect()}
    b = {r.doc_id for r in stratified_sample(ids.repartition(7), 0.3).collect()}
    assert a == b  # DataFrame.sample() fails exactly this property


def test_sample_nested_fractions_are_subsets(spark, ids):
    s10 = {r.doc_id for r in stratified_sample(ids, 0.1).collect()}
    s30 = {r.doc_id for r in stratified_sample(ids, 0.3).collect()}
    assert s10 <= s30
    assert len(s30) > len(s10) > 0


def test_split_and_sample_are_pure_projections(spark, ids):
    """No Exchange in either plan: the assignment must be shuffle-free."""
    import contextlib
    import io

    for df in (split_assign(ids, {"a": 0.5, "b": 0.5}), stratified_sample(ids, 0.5)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "Exchange" not in buf.getvalue()


def test_mixture_sample_properties(spark, ids):
    """Per-group mixture: frac-1.0 groups keep everything, frac-0 drops
    everything, a group's smaller fraction is a subset of its larger
    one, membership survives repartitioning, and still no Exchange."""
    import contextlib
    import io

    from gtfs_realtime_etl_spark.operators.splits import mixture_sample

    docs = ids.withColumn(
        "source",
        F.when(F.col("doc_id") % 3 == 0, "keep_all")
        .when(F.col("doc_id") % 3 == 1, "half")
        .otherwise("drop"),
    )
    fr = {"keep_all": 1.0, "half": 0.5, "drop": 0.0}
    kept = mixture_sample(docs, fr, default=0.0)
    kp = kept.toPandas()
    assert set(kp[kp["source"] == "keep_all"]["doc_id"]) == set(
        docs.filter("source = 'keep_all'").toPandas()["doc_id"]
    )
    assert not (kp["source"] == "drop").any()
    n_half_total = docs.filter("source = 'half'").count()
    n_half_kept = (kp["source"] == "half").sum()
    assert 0 < n_half_kept < n_half_total

    # nested subset per group + repartition invariance
    quarter = mixture_sample(docs, {"half": 0.25}, default=0.0)
    q_ids = set(quarter.toPandas()["doc_id"])
    assert q_ids <= set(kp[kp["source"] == "half"]["doc_id"])
    re = mixture_sample(docs.repartition(13), fr, default=0.0)
    assert set(re.toPandas()["doc_id"]) == set(kp["doc_id"])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mixture_sample(docs, fr).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_cap_per_group_matches_naive_window_and_is_stable(spark):
    """Salted two-phase cap == naive single window; membership is
    invariant under repartitioning."""
    from pyspark.sql import Window

    from gtfs_realtime_etl_spark.operators.splits import (
        cap_per_group,
        split_slot,
    )

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        (F.col("id") * 3).alias("n_chars"),
    )
    k = 4
    kept = cap_per_group(df, k)
    naive = (
        df.withColumn("_s", split_slot(F.col("doc_id")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.asc("_s"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("_rn") <= k)
        .drop("_s", "_rn")
    )
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in naive.collect()
    )
    assert kept.groupBy("source").count().agg(F.max("count")).collect()[0][0] <= k
    repart = cap_per_group(df.repartition(13), k)
    assert sorted(r.doc_id for r in repart.collect()) == sorted(
        r.doc_id for r in kept.collect()
    )
    assert kept.columns == df.columns


def test_epoch_shuffle_is_a_real_shuffle(spark):
    """The per-epoch order must (a) differ across epochs, (b) not
    preserve doc_id runs (the affine-only key would map consecutive ids
    to a constant-stride progression), and (c) be a permutation."""
    from gtfs_realtime_etl_spark.plans.analytics2 import q_epoch_shuffle
    from tests.conftest import SF_SMOKE

    rows = q_epoch_shuffle(spark, SF_SMOKE).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["pos"]
    e0, e1 = by_epoch[0], by_epoch[1]
    n = len(e0)
    assert len(e1) == n
    assert sorted(e0.values()) == list(range(1, n + 1))  # permutation
    # (a) epochs differ for most docs
    same = sum(1 for d in e0 if e0[d] == e1[d])
    assert same < n * 0.05, f"{same}/{n} docs kept their position"
    # (b) consecutive doc_ids land far apart on average (anti-run):
    ids = sorted(e0)
    gaps = [abs(e0[ids[i + 1]] - e0[ids[i]]) for i in range(len(ids) - 1)]
    assert sum(gaps) / len(gaps) > n * 0.1, "consecutive ids stayed adjacent"
