"""Twenty-seventh query bank: incremental MinHash-LSH dedup (the
dedup analog of bank 26's incremental flagship — fold-as-it-lands
maintenance of a near-duplicate index over arrival batches).

- ``dedup_incremental`` — the one-shot banded-LSH near-dedup
  (``operators/dedup.py::minhash_lsh_dedup``) restated as an
  INCREMENTAL fold over arrival batches, the shape a 100 TB
  training-data lake actually runs: each new batch of documents is
  signed and banded ONCE (O(batch) work — a document's signature
  depends only on its own text, so the per-batch fold is
  batch-local by construction), probed against the STANDING banded
  index (new×index candidate pairs) and against itself (new×new
  pairs), and then appended to the index.  Nothing re-signs or
  re-pairs history.

  Exactness vs the one-shot (the fold/merge contract):

  * a final bucket B = ∪_d B_d emits, across batches, exactly
    { (x, y) : x ∈ B_i, y ∈ B_j, j <= i } = all unordered pairs of
    B — the same set the one-shot's per-bucket pair explosion emits;
  * the ``max_bucket`` cap is MONOTONE: a bucket's cumulative size
    only grows, so "skip probing buckets whose running size already
    exceeds the cap" never discards a pair the one-shot would keep
    (scale guard: no quadratic emission from an overgrown bucket at
    ANY point of the fold), and the finalize step re-filters every
    surviving candidate against the FINAL bucket sizes — a SUM-merge
    monoid over per-batch bucket counts — so pairs emitted while a
    bucket was still small are dropped exactly when the one-shot
    would have dropped the whole bucket;
  * candidate pairs then dedup (a pair may collide in several bands
    / several batches) and verify with the exact shingle-Jaccard,
    identical to the one-shot tail.

  The registry form drives the fold over ``DEDUP_INC_BATCHES``
  deterministic arrival slices (``doc_id % DEDUP_INC_BATCHES``) inside
  one plan; its DuckDB oracle is the ONE-SHOT pipeline over the whole
  corpus — a green row therefore certifies fold == one-shot
  cross-engine.  ``tests/test_dedup_incremental.py`` drives the real
  cross-job contract: batches land as separate jobs on a
  batch-partitioned lake (partition pruning asserted via runtime
  ``input_file_name()``), the standing index and candidate set persist
  as parquet between jobs, and the final fold output is row-identical
  to the one-shot.

  The verify threshold deliberately differs from the
  ``minhash_lsh_pairs`` family (0.35 vs 0.2) so this entry exercises a
  second verify selectivity rather than duplicating an existing
  result.  The band layout stays 8 bands x 4 rows: a 16x2 layout was
  measured pathological on this corpus (the synthetic documents share
  a tiny vocabulary, so baseline Jaccard is high and 2-hash band keys
  collide constantly — 3.67M in-bucket pair rows at sf0.1 vs 56k for
  8x4; LSH band width must rise with baseline similarity).

At 100 TB: per-batch cost is one narrow signature pass over the new
documents plus one shuffle of the new band rows against the standing
index on (band_id, band_key); the index itself is append-only and
bucket-capped, and the finalize aggregates are bucket-grain (bounded
by the cap).  History is never re-signed.

Reference scope note: the reference (smohiudd/gtfs-realtime-etl) has
no analytics surface of this kind; this is a driver-mandated
LLM-pipeline extension (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.functions.hashing import (
    minhash_text_kernel,
    sql_minhash_sig,
    sql_shingle_hashes,
)
from gtfs_realtime_etl_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    _saturate,
    jaccard_pairs,
)
from gtfs_realtime_etl_spark.plans.staging import stage_to_tmp_partitioned
from gtfs_realtime_etl_spark.sources.testdata import load_testdata

DEDUP_INC_NUM = 32
DEDUP_INC_BANDS = 8
DEDUP_INC_K = 5
DEDUP_INC_THRESHOLD = 0.35
DEDUP_INC_BATCHES = 4


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_testdata(spark, sf_dir, tables=tuple(names))
    return [tabs[n] for n in names]


def lsh_band_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEDUP_INC_NUM,
    bands: int = DEDUP_INC_BANDS,
    shingle_k: int = DEDUP_INC_K,
) -> DataFrame:
    """Banded MinHash rows ``(doc_id, band_id, band_key)`` for a batch
    of documents — the per-batch unit of the incremental index.  One
    fused Arrow text→signature pass, then a narrow band explode; a
    batch's rows depend only on that batch's text (batch-local fold)."""
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"
    sig = _saturate(docs).select(
        F.col(id_col).alias("doc_id"),
        minhash_text_kernel(num_hashes, shingle_k)(F.col(text_col)).alias("sig"),
    )
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )


def probe_index(
    new_rows: DataFrame,
    index_rows: DataFrame | None,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate pairs contributed by ONE batch: new×index plus
    new×new, bucket-capped on the RUNNING bucket size (index ∪ new).

    Emits ``(band_id, band_key, id_a, id_b)`` with ``id_a < id_b`` —
    the bucket key is kept so the finalize step can re-filter against
    FINAL bucket sizes (see module doc).  The running-size guard is a
    pure scale protection: sizes only grow, so any bucket it skips
    would be dropped by the finalize filter anyway."""
    keys = ["band_id", "band_key"]
    cumulative = (
        index_rows.unionByName(new_rows) if index_rows is not None else new_rows
    )
    ok = (
        cumulative.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") <= max_bucket)
        .select(*keys)
    )
    guarded_new = new_rows.join(ok, keys, "left_semi")
    parts = []
    if index_rows is not None:
        parts.append(
            guarded_new.alias("n")
            .join(index_rows.alias("o"), keys)
            .select(
                *keys,
                F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_a"),
                F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_b"),
            )
        )
    parts.append(
        guarded_new.alias("a")
        .join(guarded_new.alias("b"), keys)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            *keys,
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
    )
    return reduce(lambda x, y: x.unionByName(y), parts)


def finalize_dedup_candidates(
    all_candidates: DataFrame,
    index_rows: DataFrame,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Merge step: re-filter accumulated candidates against the FINAL
    bucket sizes (SUM-merge monoid over per-batch counts — computed
    here directly from the full index), then dedup pairs.  This is
    what makes the fold equal the one-shot under the bucket cap: a
    bucket that outgrew the cap AFTER emitting pairs has every one of
    those pairs dropped, exactly as the one-shot drops the bucket."""
    keys = ["band_id", "band_key"]
    final_ok = (
        index_rows.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("cnt") >= 2) & (F.col("cnt") <= max_bucket))
        .select(*keys)
    )
    return (
        all_candidates.join(final_ok, keys, "left_semi")
        .select("id_a", "id_b")
        .distinct()
    )


def dedup_incremental_pairs(
    documents: DataFrame,
    n_batches: int = DEDUP_INC_BATCHES,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """The full fold, in one plan: slice the corpus into deterministic
    arrival batches, fold each through :func:`probe_index` against the
    growing banded index, finalize, and verify with exact
    shingle-Jaccard.

    The per-batch band rows are staged ONCE, hive-partitioned on the
    batch id (round-12): the in-plan form used to run one staged write
    per batch — ``n_batches`` signature passes over the corpus and
    ``n_batches`` write jobs whose per-job overhead dominated the
    query's sf0.1 cost — but a document's signature depends only on
    its own text, so one pass over the corpus with the arrival slice
    as a partition column produces bit-identical per-batch frames, and
    every ``batch``-filtered read below is partition-pruned exactly
    like the lake-resident index in the cross-job form
    (``tests/test_dedup_incremental.py``, which still signs each batch
    in its own job — the probe/finalize fold contract is unchanged
    here, only the staging emulation is consolidated)."""
    staged = stage_to_tmp_partitioned(
        lsh_band_rows(documents).withColumn(
            "batch",
            F.pmod(F.col("doc_id"), F.lit(n_batches)).cast("int"),
        ),
        "dedup_inc_band",
        "batch",
    )
    batches = [
        staged.filter(F.col("batch") == F.lit(d)).select(
            "doc_id", "band_id", "band_key"
        )
        for d in range(n_batches)
    ]
    cand_parts = []
    for d in range(n_batches):
        index_rows = (
            staged.filter(F.col("batch") < F.lit(d)).select(
                "doc_id", "band_id", "band_key"
            )
            if d
            else None
        )
        cand_parts.append(probe_index(batches[d], index_rows, max_bucket))
    all_candidates = reduce(lambda x, y: x.unionByName(y), cand_parts)
    full_index = staged.select("doc_id", "band_id", "band_key")
    kept = finalize_dedup_candidates(all_candidates, full_index, max_bucket)
    verified = jaccard_pairs(
        documents,
        kept,
        shingle_k=DEDUP_INC_K,
        threshold=DEDUP_INC_THRESHOLD,
    )
    return verified.select(
        "id_a",
        "id_b",
        (F.round(F.col("jaccard") * F.lit(1e6), 0) / F.lit(1e6)).alias("jaccard"),
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = _t(spark, sf_dir, "documents")
    return dedup_incremental_pairs(documents)


def _dedup_incremental_sql() -> str:
    """ONE-SHOT oracle: the fold must reproduce the plain banded-LSH
    pipeline over the whole corpus (8 bands of 4 rows, threshold
    0.35).  A green row certifies fold == one-shot cross-engine."""
    rpb = DEDUP_INC_NUM // DEDUP_INC_BANDS
    return f"""
WITH h AS (
  SELECT doc_id, {sql_shingle_hashes("text", DEDUP_INC_K)} AS hashes
  FROM documents
),
sig AS (
  SELECT doc_id, {sql_minhash_sig("hashes", DEDUP_INC_NUM)} AS sig FROM h
),
banded AS (
  SELECT doc_id, band_id,
         list_slice(sig, band_id * {rpb} + 1,
                    band_id * {rpb} + {rpb}) AS band_key
  FROM sig, (SELECT unnest(range(0, {DEDUP_INC_BANDS})) AS band_id)
),
ok AS (
  SELECT band_id, band_key FROM banded GROUP BY band_id, band_key
  HAVING COUNT(*) BETWEEN 2 AND {DEFAULT_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a
  JOIN ok ON a.band_id = ok.band_id AND a.band_key = ok.band_key
  JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, list_distinct(hashes) AS s FROM h),
scored AS (
  SELECT id_a, id_b,
         CAST(length(list_intersect(sa.s, sb.s)) AS DOUBLE)
         / CAST(length(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS j
  FROM cand
  JOIN sets sa ON sa.doc_id = cand.id_a
  JOIN sets sb ON sb.doc_id = cand.id_b
)
SELECT id_a, id_b, ROUND((j) * 1e6, 0) / 1e6 AS jaccard
FROM scored WHERE j >= {DEDUP_INC_THRESHOLD}
"""


EXT26_QUERIES = {
    "dedup_incremental": q_dedup_incremental,
}

EXT26_ORACLE_SQL = {
    "dedup_incremental": _dedup_incremental_sql(),
}
