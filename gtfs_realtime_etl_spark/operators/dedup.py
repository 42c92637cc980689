"""Deduplication operators for large-scale corpus curation.

Four strategies, all shuffle-frugal by construction:

- :func:`exact_dedup` — digest groupBy; one shuffle on the hash.
- :func:`minhash_lsh_candidates` / :func:`minhash_lsh_dedup` — shingle →
  MinHash signature → banded LSH bucket-join.  The quadratic comparison
  only ever happens WITHIN an LSH bucket, so at 100 TB the cost is one
  shuffle on (band, bucket-hash) plus tiny per-bucket cross products.
- :func:`simhash` — 64-bit SimHash over tokens; near-dups share hash
  prefixes (grouped by rotation for hamming-distance search).
- n-gram Jaccard verification (:func:`jaccard_pairs`) — exact similarity
  on candidate pairs only (never all pairs).

All hashing uses Spark's built-in xxhash64 — JVM-side, seed-stable
across runs/partitions, so signatures are deterministic engine state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from gtfs_realtime_etl_spark.functions.text import char_shingles, tokens

# MinHash permutations are affine maps h -> (a*h + b) mod M_31 over the
# Mersenne prime 2^31-1.  Keeping a, b, h all below 2^31 bounds a*h + b
# under 2^62, so the arithmetic never overflows int64 even with ANSI
# mode on — same design as Spark MLlib's MinHashLSH.  Parameters come
# from a fixed LCG so signatures are stable forever.
_MERSENNE_31 = (1 << 31) - 1


def _perm_params(n: int) -> list[tuple[int, int]]:
    out = []
    x = 1
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x % (_MERSENNE_31 - 1)) + 1  # 1 <= a < M_31
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = x % _MERSENNE_31  # 0 <= b < M_31
        out.append((a, b))
    return out


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, lower-cased canonical form for hashing."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-digest groupBy.

    Returns one row per distinct content: ``content_hash,
    survivor_<id>, n_copies``.  Single shuffle, keyed on the digest —
    the only strategy that is safe to run on the full 100 TB corpus
    without candidate generation.
    """
    return (
        docs.withColumn("content_hash", F.md5(normalized_text(F.col(text_col))))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(f"survivor_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_hashes(text: Column, shingle_k: int = 5) -> Column:
    """One 31-bit hash per distinct k-shingle (array<bigint>)."""
    return F.transform(
        F.array_distinct(char_shingles(text, shingle_k)),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)),
    )


def minhash_from_hashes(hashes: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint>) from a shingle-hash array.

    ``hashes`` should be a MATERIALIZED attribute (its own projection
    step), not an inline expression: this builds ``num_hashes``
    permutation folds that each reference it, and an inlined expression
    would be recomputed once per permutation.
    """
    mins = []
    for a, b in _perm_params(num_hashes):
        # (a*h + b) mod M_31; a, b, h < 2^31 so no int64 overflow.
        permuted = F.transform(
            hashes,
            lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_31)),  # noqa: B023
        )
        mins.append(F.array_min(permuted))
    return F.array(*mins)


def minhash_signature(
    text: Column, num_hashes: int = 32, shingle_k: int = 5
) -> Column:
    """MinHash signature as a single Column expression (convenience form;
    prefer shingle_hashes + minhash_from_hashes across a projection
    boundary in hot paths — see minhash_lsh_candidates)."""
    return minhash_from_hashes(shingle_hashes(text, shingle_k), num_hashes)


def minhash_pd(num_hashes: int = 32):
    """Arrow-batched numpy MinHash kernel (hot-path twin of
    :func:`minhash_from_hashes`, bit-identical output).

    Spark's higher-order functions evaluate interpreted (outside
    whole-stage codegen), so the Column form pays ``num_hashes`` full
    array passes per row in the expression interpreter.  This kernel
    does the same affine-permutation fold as ONE vectorized
    ``(P, n) = (a*h + b) mod M → min`` per row inside an Arrow batch —
    two orders of magnitude faster at equal semantics.  Input stays
    JVM-hashed (xxhash64), so signatures remain engine-deterministic.
    """
    params = np.asarray(_perm_params(num_hashes), dtype=np.int64)
    a = params[:, 0][:, None]  # (P, 1)
    b = params[:, 1][:, None]

    @F.pandas_udf(ArrayType(LongType()))
    def _kernel(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            arr = np.asarray(h, dtype=np.int64)
            if arr.size == 0:
                out.append([None] * num_hashes)  # array_min([]) → NULL
            else:
                # a, b, h < 2^31 ⇒ a*h + b < 2^62: no int64 overflow.
                out.append(((a * arr[None, :] + b) % _MERSENNE_31).min(axis=1))
        return pd.Series(out)

    return _kernel


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH on MinHash signatures.

    ``num_hashes`` must divide into ``bands`` equal rows-per-band.  Two
    docs become a candidate pair iff SOME band of their signatures is
    identical.  Plan: explode bands (narrow) → shuffle once on
    (band_id, band_hash) → per-bucket self-join → distinct pairs.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"

    # Three projection steps so each stage's expression is evaluated
    # exactly once per row: shingle-hash array → signature → bands.
    sig = docs.select(
        F.col(id_col),
        shingle_hashes(F.col(text_col), shingle_k).alias("_hashes"),
    ).select(
        F.col(id_col),
        minhash_pd(num_hashes)(F.col("_hashes")).alias("sig"),
    )
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    # Pairs come from ONE aggregation on (band_id, band_hash) plus an
    # in-bucket pair explosion (all JVM higher-order ops) — not a
    # self-join, which would evaluate the signature pipeline twice and
    # shuffle both copies.  LSH buckets are tiny by construction, so the
    # per-bucket quadratic explosion is bounded.
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("ids"), i + F.lit(2), F.size(F.col("ids"))
                    ),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
    )
    return (
        buckets.select(pair.alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs.

    Joins the (small) candidate set back to the shingle sets and keeps
    pairs with Jaccard ≥ threshold.  Only candidates are compared — at
    scale this is the cheap tail of the pipeline.
    """
    # Shingle only the docs that appear in some candidate pair (semi-join
    # pruning): at scale the candidate set is a tiny fraction of the
    # corpus, so this avoids re-shingling everything twice.
    involved = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = docs.join(involved, id_col, "left_semi").select(
        F.col(id_col),
        F.array_distinct(char_shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    out = (
        candidates.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def minhash_lsh_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dedup: LSH candidates → exact Jaccard → verified pairs.

    Duplicate-cluster resolution (connected components) is left to the
    caller; the conventional greedy rule — drop every ``id_b`` — is a
    single semi-join against this result.
    """
    cands = minhash_lsh_candidates(
        docs, text_col, id_col, num_hashes, bands, shingle_k
    )
    return jaccard_pairs(docs, cands, text_col, id_col, shingle_k, threshold)


def simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash from a token-hash array.  ``hashes`` should be a
    materialized attribute — this builds ``bits`` vote aggregations that
    each reference it (an inline expression would be recomputed per bit)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),  # noqa: B023
        )
        out = out + F.shiftleft(F.when(votes > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i)
    return out


def token_hashes(text: Column) -> Column:
    """xxhash64 of each whitespace token (array<bigint>)."""
    return F.transform(tokens(text), lambda t: F.xxhash64(t))


@F.pandas_udf(LongType())
def simhash_pd(hashes: pd.Series) -> pd.Series:
    """Arrow-batched numpy SimHash kernel (hot-path twin of
    :func:`simhash_from_hashes`, bit-identical output).

    The Column form runs 64 interpreted vote passes over the token-hash
    array per row; this does one ``(n, 64)`` bit-unpack + vote sum per
    row inside an Arrow batch.  Bit i is set iff the +1/-1 vote sum of
    that bit across token hashes is positive — identical rule, and the
    uint64→int64 view preserves Spark's long bit pattern exactly.
    """
    shifts = np.arange(64, dtype=np.uint64)
    ones = np.uint64(1) << shifts
    res = np.zeros(len(hashes), dtype=np.int64)
    for j, h in enumerate(hashes):
        arr = np.asarray(h, dtype=np.int64)
        if arr.size == 0:
            continue  # aggregate over [] → all-zero votes → 0
        bits = (arr.astype(np.uint64)[:, None] >> shifts) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        word = ones[votes > 0].sum(dtype=np.uint64)
        res[j] = word.astype(np.int64)
    return pd.Series(res)


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens as a single Column
    expression.  Per token: xxhash64; per bit: +1/-1 vote; sign of the
    vote sum sets the bit.  Prefer token_hashes + simhash_from_hashes
    across a projection boundary in hot paths (see simhash_dedup)."""
    return simhash_from_hashes(token_hashes(text), bits)


def simhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup candidates: identical SimHash prefix (one shuffle on the
    prefix).  Returns pairs with the hamming distance of full hashes."""
    sh = (
        docs.select(
            F.col(id_col), token_hashes(F.col(text_col)).alias("_hashes")
        )
        .select(F.col(id_col), simhash_pd(F.col("_hashes")).alias("simhash"))
        .withColumn("prefix", F.shiftrightunsigned("simhash", 64 - prefix_bits))
    )
    # One aggregation on the prefix + in-bucket pair explosion (same
    # plan shape as minhash_lsh_candidates): simhash is computed once.
    buckets = (
        sh.groupBy("prefix")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), "simhash"))
            ).alias("rows")
        )
        .filter(F.size("rows") > 1)
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("rows"),
                lambda x, i: F.transform(
                    F.slice(F.col("rows"), i + F.lit(2), F.size(F.col("rows"))),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        F.bit_count(
                            x["simhash"].bitwiseXOR(y["simhash"])
                        ).alias("hamming"),
                    ),
                ),
            )
        )
    )
    return buckets.select(pair.alias("p")).select(
        F.col("p.id_a"), F.col("p.id_b"), F.col("p.hamming")
    )
