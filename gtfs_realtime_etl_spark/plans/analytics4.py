"""Seventh query bank: distributed linear algebra over embedding
columns and a MinHash sketch-accuracy harness.

These extend the LLM-pipeline surface with the numeric groundwork a
training pipeline runs before/while assembling data:

- ``embedding_covariance`` — the (upper-triangle) covariance matrix of
  the embedding distribution: the input to whitening / PCA / drift
  monitoring.  Decimal-accumulated so the result is bit-identical
  across engines and partitionings; the float fast path for 100 TB
  lives in ``operators/linalg.py::gram_matrix`` (mapInPandas partial
  Gram per partition — one narrow pass + one tiny reduce).
- ``embedding_standardize`` — per-dimension z-scoring (diagonal
  whitening) of the leading dimensions, the feature-scaling transform:
  one tiny per-dim stats aggregate broadcast back over a narrow
  projection.
- ``minhash_jaccard_estimate`` — the accuracy contract of the MinHash
  sketch the dedup pipeline rides on: for every candidate pair, the
  EXACT shingle Jaccard next to the signature estimate and their
  absolute error, plus a boolean tolerance verdict.  Everything —
  including the estimate — is integer/rational arithmetic, so the
  whole report is hash-exact against the DuckDB oracle (the sketch is
  deterministic; this is the rare approximate operator whose oracle is
  exact).

Reference scope note: the reference (smohiudd/gtfs-realtime-etl) has
no linear-algebra or sketch surface; these are driver-mandated
LLM-pipeline extensions (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.functions.hashing import (
    MOD,
    minhash_text_kernel,
    sql_minhash_sig,
    sql_shingle_hashes,
)
from gtfs_realtime_etl_spark.functions.text import char_shingles
from gtfs_realtime_etl_spark.sources.testdata import load_testdata


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_testdata(spark, sf_dir, tables=tuple(names))
    return [tabs[n] for n in names]


_AZ_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LOWER = "abcdefghijklmnopqrstuvwxyz"


# ---------------------------------------------------------------------------
# Embedding covariance (upper triangle).
#
# cov(i,j) = S_ij/n − (S_i/n)(S_j/n) with every sum accumulated in
# DECIMAL(30,12) — addition is then exact and associative, so the
# result is independent of partitioning AND engine (the same
# discipline as embedding_centroids).  The per-row outer product is a
# pure projection: posexplode(v) gives (i, x_i), then
# posexplode(slice(v, i, d−i+1)) gives the j ≥ i tail — upper triangle
# only, no join of any kind; the single shuffle is the (i,j) group
# (d(d+1)/2 = 2,080 groups at d=64 — partial aggregation does almost
# all the work map-side).  Per-dim S_i rides a second tiny aggregate
# broadcast back onto the triangle.
#
# Scale shape: the explode multiplies rows ×2,080 but each exploded
# row is 3 numbers wide, and partial agg collapses them within the
# task — network traffic is tasks × 2,080 partials, not rows × 2,080.
# The non-exact float alternative (one numpy X^T·X per partition) is
# operators/linalg.py::gram_matrix; parity between the two is pinned
# by tests/test_linalg.py.
# ---------------------------------------------------------------------------

COV_ROUND = 8
_DEC = "decimal(30,12)"


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _t(spark, sf_dir, "embeddings")
    e = emb.select(F.col("embedding").cast("array<double>").alias("v"))
    xi = e.select("v", F.posexplode("v").alias("i0", "xi"))
    up = xi.select(
        (F.col("i0") + 1).alias("i"),
        "xi",
        F.posexplode(
            F.slice(F.col("v"), F.col("i0") + 1, F.size("v") - F.col("i0"))
        ).alias("j0", "xj"),
    ).select(
        "i",
        (F.col("i") + F.col("j0")).alias("j"),
        (F.col("xi") * F.col("xj")).alias("prod"),
    )
    tri = up.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("prod").cast(_DEC)).alias("sxy"),
    )
    dims = (
        xi.select((F.col("i0") + 1).alias("d"), "xi")
        .groupBy("d")
        .agg(F.sum(F.col("xi").cast(_DEC)).alias("s"))
    )
    nd = F.col("n").cast("double")
    cov = (
        F.col("sxy").cast("double") / nd
        - (F.col("si").cast("double") / nd) * (F.col("sj").cast("double") / nd)
    )
    return (
        tri.join(
            F.broadcast(dims.select(F.col("d").alias("i"), F.col("s").alias("si"))),
            "i",
        )
        .join(
            F.broadcast(dims.select(F.col("d").alias("j"), F.col("s").alias("sj"))),
            "j",
        )
        .select("i", "j", "n", F.round(cov, COV_ROUND).alias("cov"))
    )


Q_EMBEDDING_COVARIANCE_SQL = f"""
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
x AS (
  SELECT v, pos AS i, v[pos] AS xi
  FROM (SELECT v, unnest(range(1, len(v) + 1)) AS pos FROM e)
),
up AS (
  SELECT i, i + p2 - 1 AS j, xi * v[i + p2 - 1] AS prod
  FROM (SELECT v, i, xi, unnest(range(1, len(v) - i + 2)) AS p2 FROM x)
),
tri AS (
  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(prod AS DECIMAL(30,12))) AS sxy
  FROM up GROUP BY i, j
),
dims AS (
  SELECT i AS d, SUM(CAST(xi AS DECIMAL(30,12))) AS s
  FROM x GROUP BY i
)
SELECT i, j, n,
       ROUND(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(a.s AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(b.s AS DOUBLE) / CAST(n AS DOUBLE)),
             {COV_ROUND}) AS cov
FROM tri
JOIN dims a ON a.d = tri.i
JOIN dims b ON b.d = tri.j
"""


# ---------------------------------------------------------------------------
# Per-dimension standardization (diagonal whitening) of the leading
# STD_DIMS dimensions: z = (x − μ_d)/σ_d with μ, σ from decimal-exact
# sums (sample stddev, matching the engine convention everywhere else).
# One narrow slice+explode projection, one 8-group aggregate broadcast
# back — the plan a 100 TB feature-scaling pass wants (the stats side
# is O(d), the data side never shuffles).
# ---------------------------------------------------------------------------

STD_DIMS = 8
STD_ROUND = 6


def q_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(
            F.slice(F.col("embedding").cast("array<double>"), 1, STD_DIMS)
        ).alias("d0", "x"),
    ).select("vec_id", (F.col("d0") + 1).alias("dim"), "x")
    stats = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(_DEC)).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    stats = stats.select(
        "dim", mean.alias("mu"), F.sqrt(var).alias("sigma")
    ).where(F.col("sigma") > 0)
    return (
        x.join(F.broadcast(stats), "dim")
        .select(
            "vec_id",
            "dim",
            F.round((F.col("x") - F.col("mu")) / F.col("sigma"), STD_ROUND).alias(
                "z"
            ),
        )
    )


Q_EMBEDDING_STANDARDIZE_SQL = f"""
WITH x AS (
  SELECT vec_id, pos AS dim, v[pos] AS x
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
               unnest(range(1, {STD_DIMS} + 1)) AS pos
        FROM embeddings)
),
stats AS (
  SELECT dim,
         CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) AS s,
         CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE) AS s2,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM x GROUP BY dim
),
ms AS (
  SELECT dim, s / n AS mu, sqrt((s2 - s * s / n) / (n - 1.0)) AS sigma
  FROM stats
)
SELECT vec_id, x.dim, ROUND((x - mu) / sigma, {STD_ROUND}) AS z
FROM x JOIN ms ON x.dim = ms.dim
WHERE sigma > 0
"""


# ---------------------------------------------------------------------------
# MinHash sketch accuracy — exact oracle for an approximate operator.
#
# Candidate pairs use the same (source, length-bucket, ±20 chars) equi
# bucketing as dedup_ngram_jaccard (one hash shuffle, quadratic only
# within tiny buckets).  Per pair:
#   jaccard   exact |A∩B|/|A∪B| over distinct 5-char shingles
#   est       (# agreeing signature slots)/P — the MinHash estimate
#   abs_err   |est − jaccard|
#   within_tol  abs_err ≤ MJE_TOL
# The signature is the SAME affine-permutation construction the dedup
# pipeline uses (functions/hashing.py: Arrow kernel Spark-side, integer
# SQL oracle-side, bit-pinned against each other), so est is
# deterministic integer arithmetic — every column hash-matches.
# MJE_TOL = 0.30 ≈ 3.8σ of the P=64 estimator's worst-case binomial
# std (√(J(1−J)/64) ≤ 0.0625); observed max error on the synthetic
# corpus is far lower, and determinism means the verdict column cannot
# flake.
# ---------------------------------------------------------------------------

MJE_NUM_HASHES = 64
MJE_SHINGLE_K = 5
MJE_LEN_BUCKET = 32
MJE_TOL = 0.30


def q_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = _t(spark, sf_dir, "documents")
    kern = minhash_text_kernel(MJE_NUM_HASHES, MJE_SHINGLE_K)
    n_tasks = spark.sparkContext.defaultParallelism
    folded = documents.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(f"n_chars div {MJE_LEN_BUCKET}").alias("len_bucket"),
        F.translate(F.col("text"), _AZ_UPPER, _AZ_LOWER).alias("_t"),
        kern(F.col("text")).alias("sig"),
    ).repartition(n_tasks, "source", "len_bucket")
    docs = folded.select(
        "doc_id",
        "source",
        "n_chars",
        "len_bucket",
        "sig",
        F.array_distinct(
            char_shingles(F.col("_t"), MJE_SHINGLE_K, prefolded=True)
        ).alias("shingles"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 20),
    )
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    jac = inter.cast("double") / union.cast("double")
    matches = F.aggregate(
        F.zip_with(
            F.col("a.sig"),
            F.col("b.sig"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = matches.cast("double") / F.lit(float(MJE_NUM_HASHES))
    abs_err = F.round(F.abs(est - jac), 6)
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
        F.round(est, 6).alias("est"),
        abs_err.alias("abs_err"),
        (abs_err <= F.lit(MJE_TOL)).alias("within_tol"),
    )


def _mje_sql() -> str:
    sig = sql_minhash_sig(
        sql_shingle_hashes("text", MJE_SHINGLE_K), MJE_NUM_HASHES
    )
    return f"""
WITH docs AS (
  SELECT doc_id, source, n_chars, n_chars // {MJE_LEN_BUCKET} AS len_bucket,
         {sig} AS sig,
         list_distinct(list_transform(
           range(1, GREATEST(length(text) - {MJE_SHINGLE_K - 1}, 1) + 1),
           i -> substr(translate(text, '{_AZ_UPPER}', '{_AZ_LOWER}'), i, {MJE_SHINGLE_K}))) AS shingles
  FROM documents
)
SELECT doc_a, doc_b, jaccard, est, abs_err, abs_err <= {MJE_TOL} AS within_tol
FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / CAST(length(list_distinct(list_concat(a.shingles, b.shingles)))
                      AS DOUBLE), 6) AS jaccard,
         ROUND(CAST(length(list_filter(range(1, {MJE_NUM_HASHES} + 1),
                                       idx -> a.sig[idx] = b.sig[idx]))
                    AS DOUBLE) / {float(MJE_NUM_HASHES)}, 6) AS est,
         ROUND(ABS(CAST(length(list_filter(range(1, {MJE_NUM_HASHES} + 1),
                                           idx -> a.sig[idx] = b.sig[idx]))
                        AS DOUBLE) / {float(MJE_NUM_HASHES)}
                   - CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                     / CAST(length(list_distinct(list_concat(a.shingles, b.shingles)))
                            AS DOUBLE)), 6) AS abs_err
  FROM docs a JOIN docs b
    ON a.source = b.source AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id AND ABS(a.n_chars - b.n_chars) <= 20
)
"""


Q_MINHASH_JACCARD_ESTIMATE_SQL = _mje_sql()


EXT6_QUERIES = {
    "embedding_covariance": q_embedding_covariance,
    "embedding_standardize": q_embedding_standardize,
    "minhash_jaccard_estimate": q_minhash_jaccard_estimate,
}

EXT6_ORACLE_SQL = {
    "embedding_covariance": Q_EMBEDDING_COVARIANCE_SQL,
    "embedding_standardize": Q_EMBEDDING_STANDARDIZE_SQL,
    "minhash_jaccard_estimate": Q_MINHASH_JACCARD_ESTIMATE_SQL,
}
