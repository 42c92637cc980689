"""Tenth query bank: BPE tokenizer training and privacy auditing.

- ``bpe_train`` — the full iterative byte-pair-encoding trainer
  (``operators/bpe.py``): ``BPE_MERGES`` rounds of most-frequent-pair
  merge over the word-frequency dictionary, output = the ranked merge
  table.  The oracle UNROLLS the trainer round for round into chained
  CTEs (the ``kmeans_centroids`` / ``pagerank_knn`` promotion applied
  to a tokenizer fit): per round, a pair aggregate, a top-1 selection,
  and a ``list_reduce`` greedy merge fold that is bit-identical to the
  engine's ``F.aggregate`` fold.  Pure integer counts, lexicographic
  tie-break — hash-exact with no rounding anywhere.
- ``bpe_encode_stats`` — the tokenizer's APPLY path: after the same
  ``BPE_MERGES`` rules, the distribution of symbols-per-word across
  the dictionary (weighted by corpus frequency) — the
  fertility/compression curve a tokenizer team watches when sizing a
  vocabulary.
- ``k_anonymity`` — privacy audit for training-data release: group
  rows into quasi-identifier equivalence classes (nation × market
  segment × account-balance band), then report the k-anonymity
  histogram: for each class size k, how many classes / rows sit there,
  the share of the table they carry, and whether they fall below the
  re-identification threshold ``K_ANON_K``.  Two chained hash
  aggregates — the second input is class-count-sized; scale-safe.

Reference scope note: the reference (smohiudd/gtfs-realtime-etl) has
no tokenizer or privacy surface; these are driver-mandated
LLM-pipeline extensions (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.bpe import _symbols, bpe_train
from gtfs_realtime_etl_spark.plans.analytics import SQL_TOKS
from gtfs_realtime_etl_spark.sources.testdata import load_testdata

BPE_MERGES = 8


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_testdata(spark, sf_dir, tables=tuple(names))
    return [tabs[n] for n in names]


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = _t(spark, sf_dir, "documents")
    merges = bpe_train(documents, n_merges=BPE_MERGES)
    return spark.createDataFrame(
        [
            (m["merge_rank"], m["lhs"], m["rhs"], m["pair_count"])
            for m in merges
        ],
        "merge_rank int, lhs string, rhs string, pair_count long",
    ).orderBy("merge_rank")


def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = _t(spark, sf_dir, "documents")
    # keep_dict: the trainer's final materialized dictionary IS the
    # encoded corpus — aggregate it directly instead of re-folding.
    _merges, encoded = bpe_train(
        documents, n_merges=BPE_MERGES, keep_dict=True
    )
    out = (
        encoded.select(F.size(_symbols(F.col("s"))).alias("n_syms"), "c")
        .groupBy("n_syms")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("c").alias("n_occurrences"),
        )
        .orderBy("n_syms")
    )
    # Materialize before releasing the trainer's persisted dictionary —
    # the returned frame must not silently rebuild the whole fit.
    out = out.localCheckpoint(eager=True)
    encoded.unpersist()
    return out


# ---------------------------------------------------------------------------
# Oracle: the trainer unrolled.  d0 is the spaced single-character word
# dictionary; each round t adds p{t} (pair counts), b{t} (the merged
# pair, ties on the smaller pair string) and d{t} (the dictionary after
# the greedy left-to-right list_reduce fold — same sentinel-space
# semantics as operators/bpe.py::merge_fold).
# ---------------------------------------------------------------------------

def _bpe_round_sql(t: int) -> str:
    return f"""p{t} AS (
  SELECT pair, CAST(SUM(c) AS BIGINT) AS n FROM (
    SELECT unnest(list_transform(range(1, len(sy)), i -> sy[i] || ' ' || sy[i+1])) AS pair, c
    FROM (SELECT string_split(s[2:], ' ') AS sy, c FROM d{t - 1})
  ) GROUP BY pair
),
b{t} AS (
  SELECT string_split(pair, ' ')[1] AS lhs, string_split(pair, ' ')[2] AS rhs, n
  FROM p{t} ORDER BY n DESC, pair ASC LIMIT 1
),
d{t} AS (
  SELECT list_reduce(list_prepend('', string_split(s[2:], ' ')),
    (acc, x) -> acc || CASE WHEN ends_with(acc, ' ' || b.lhs) AND x = b.rhs
                       THEN '' ELSE ' ' END || x) AS s, c
  FROM d{t - 1} CROSS JOIN b{t} b
)"""


def _bpe_prefix_sql() -> str:
    rounds = ",\n".join(_bpe_round_sql(t) for t in range(1, BPE_MERGES + 1))
    return f"""
WITH toks AS (SELECT unnest({SQL_TOKS}) AS w FROM documents),
words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w),
d0 AS (SELECT regexp_replace(w, '(.)', ' \\1', 'g') AS s, c FROM words),
{rounds}"""


def _bpe_train_sql() -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS INTEGER) AS merge_rank, lhs, rhs,"
        f" n AS pair_count FROM b{t}"
        for t in range(1, BPE_MERGES + 1)
    )
    return f"""{_bpe_prefix_sql()}
SELECT * FROM ({union}) ORDER BY merge_rank
"""


def _bpe_encode_stats_sql() -> str:
    return f"""{_bpe_prefix_sql()}
SELECT CAST(len(string_split(s[2:], ' ')) AS INTEGER) AS n_syms,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(c) AS BIGINT) AS n_occurrences
FROM d{BPE_MERGES} GROUP BY n_syms ORDER BY n_syms
"""


Q_BPE_TRAIN_SQL = _bpe_train_sql()
Q_BPE_ENCODE_STATS_SQL = _bpe_encode_stats_sql()


# ---------------------------------------------------------------------------
# k-anonymity audit.  Quasi-identifier = (nation, market segment,
# account-balance band of K_ANON_BAND); histogram keyed by class size.
# The table-total scalar rides a 1-row broadcast (SCALAR_BNLJ_OK).
# ---------------------------------------------------------------------------

K_ANON_K = 5
K_ANON_BAND = 1000


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    classes = (
        customer.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(K_ANON_BAND))
            .cast("int")
            .alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("k_size"))
    )
    total = customer.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        classes.groupBy("k_size")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("k_size").alias("n_rows"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k_size",
            "n_classes",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("n_total"), 12
            ).alias("row_share"),
            (F.col("k_size") < F.lit(K_ANON_K)).alias("at_risk"),
        )
        .orderBy("k_size")
    )


Q_K_ANONYMITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / {K_ANON_BAND}) AS INTEGER) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS k_size
  FROM customer GROUP BY 1, 2, 3
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM customer)
SELECT k_size,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(k_size) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(k_size) AS DOUBLE) / n_total, 12) AS row_share,
       k_size < {K_ANON_K} AS at_risk
FROM classes CROSS JOIN total
GROUP BY k_size, n_total
ORDER BY k_size
"""


EXT9_QUERIES = {
    "bpe_train": q_bpe_train,
    "bpe_encode_stats": q_bpe_encode_stats,
    "k_anonymity": q_k_anonymity,
}

EXT9_ORACLE_SQL = {
    "bpe_train": Q_BPE_TRAIN_SQL,
    "bpe_encode_stats": Q_BPE_ENCODE_STATS_SQL,
    "k_anonymity": Q_K_ANONYMITY_SQL,
}
