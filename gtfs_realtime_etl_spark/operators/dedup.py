"""Deduplication operators for large-scale corpus curation.

Four strategies, all shuffle-frugal by construction:

- :func:`exact_dedup` — digest groupBy; one shuffle on the hash.
- :func:`minhash_lsh_candidates` / :func:`minhash_lsh_dedup` — shingle →
  MinHash signature → banded LSH bucket-join.  The quadratic comparison
  only ever happens WITHIN an LSH bucket (size-capped), so at 100 TB the
  cost is one shuffle on (band_id, band_key) plus tiny per-bucket cross
  products.
- :func:`simhash_dedup` — 62-bit SimHash over tokens, bucketed by BANDED
  SEGMENTS (pigeonhole: hamming ≤ d ⇒ at least one of d+1 equal-width
  segments matches exactly), the same bounded-bucket plan shape as the
  MinHash bands.  Round 1 bucketed on a hash *prefix* (≤ 2^16 buckets
  total — bucket size grew linearly with the corpus); segments keep
  buckets O(n / 2^16) PER BAND with a hard per-bucket cap as the
  backstop.
- n-gram Jaccard verification (:func:`jaccard_pairs`) — exact similarity
  on candidate pairs only (never all pairs).

All hashing uses the portable polynomial scheme in
:mod:`gtfs_realtime_etl_spark.functions.hashing` (mod 2^31 - 1), so every
signature is reproducible in ANSI SQL and the driver's DuckDB oracle can
verify the full near-dedup family end-to-end (round 1's xxhash64
signatures were Spark-only and therefore unverifiable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.functions.hashing import (
    H64_BITS,
    MOD,
    minhash_text_kernel,
    perm_params,
    shingle_hash_set_kernel,
    shingle_hashes_column,
    simhash_tokens_kernel,
    token_hash64_column,
)
from gtfs_realtime_etl_spark.functions.text import tokens

#: Buckets larger than this are dropped from candidate generation: a
#: bucket of b docs explodes into b(b-1)/2 pairs, and pathological
#: buckets (boilerplate, empty strings) would otherwise dominate the
#: shuffle.  Standard practice in production near-dedup pipelines; the
#: oracle SQL applies the identical cap.
DEFAULT_MAX_BUCKET = 1000


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, ASCII-case-folded canonical form for
    hashing (engine-portable; see functions/hashing.py)."""
    return F.translate(
        F.trim(F.regexp_replace(text, r"\s+", " ")),
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "abcdefghijklmnopqrstuvwxyz",
    )


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
    """Portable polynomial hash per k-char window (Column twin of the
    Arrow kernel; array<bigint>).  Use the kernel in hot paths."""
    return shingle_hashes_column(text, shingle_k)


def minhash_from_hashes(hashes: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint>) from a shingle-hash array.

    ``hashes`` should be a MATERIALIZED attribute (its own projection
    step), not an inline expression: this builds ``num_hashes``
    permutation folds that each reference it, and an inlined expression
    would be recomputed once per permutation.
    """
    mins = []
    for a, b in perm_params(num_hashes):
        # (a*h + b) mod MOD; a, b, h < 2^31 so no int64 overflow.
        permuted = F.transform(
            hashes,
            lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MOD)),  # noqa: B023
        )
        mins.append(F.array_min(permuted))
    return F.array(*mins)


def minhash_signature(
    text: Column, num_hashes: int = 32, shingle_k: int = 5
) -> Column:
    """MinHash signature as a single Column expression (convenience /
    test form; the fused Arrow kernel in functions/hashing.py is the hot
    path — see minhash_lsh_candidates)."""
    return minhash_from_hashes(shingle_hashes(text, shingle_k), num_hashes)


def _saturate(docs: DataFrame) -> DataFrame:
    """Ensure the expensive Arrow kernel stage runs on every core: a
    small corpus (one parquet file → one input split) would otherwise
    serialize the signature computation on a single task.  No-op when
    the scan already yields enough splits (the 100 TB case).

    Saturation is decided from ``inputFiles()`` — plan-time metadata
    that is Spark-Connect-safe — never ``df.rdd`` (which materializes
    the RDD lineage and is unavailable under Connect).  A file-backed
    corpus with at least one file per core splits at least that wide; a
    non-file source (in-memory test frames) reports zero files and gets
    repartitioned, which is the conservative choice at that size."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(docs.inputFiles())
    except Exception:  # non-file plans on some backends
        n_files = 0
    if n_files < target:
        return docs.repartition(target)
    return docs


def _pair_explode(rows_col: str, fields) -> Column:
    """All ordered in-bucket pairs from a sorted collect_list column —
    JVM higher-order ops, no self-join (which would recompute and
    re-shuffle the signature pipeline)."""

    def _pair(x: Column, y: Column) -> Column:
        return F.struct(*fields(x, y))

    return F.explode(
        F.flatten(
            F.transform(
                F.col(rows_col),
                lambda x, i: F.transform(
                    F.slice(F.col(rows_col), i + F.lit(2), F.size(F.col(rows_col))),
                    lambda y: _pair(x, y),
                ),
            )
        )
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH on MinHash signatures.

    ``num_hashes`` must divide into ``bands`` equal rows-per-band.  Two
    docs become a candidate pair iff SOME band of their signatures is
    identical.  Plan: fused text→signature Arrow kernel (one pass) →
    explode band slices (narrow) → shuffle once on (band_id, band_key)
    → per-bucket pair explosion → distinct pairs.  The band key is the
    raw signature slice (array<bigint>), not a rehash — portable to the
    SQL oracle and collision-free.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"

    sig = _saturate(docs).select(
        F.col(id_col),
        minhash_text_kernel(num_hashes, shingle_k)(F.col(text_col)).alias("sig"),
    )
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    buckets = (
        banded.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pair = _pair_explode("ids", lambda x, y: [x.alias("id_a"), y.alias("id_b")])
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
    broadcast_sets: bool = True,
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs.

    Joins the candidate pairs back to the distinct shingle-hash sets and
    keeps pairs with Jaccard ≥ threshold.  Only candidates are compared
    — at scale this is the cheap tail of the pipeline.  Jaccard is
    computed on hash SETS (array_intersect/array_union over sorted
    distinct int64), identical to the oracle's
    list_intersect/list_distinct form.

    ``broadcast_sets`` (default) broadcasts the involved-doc hash sets:
    the candidate side then streams through a broadcast hash join and
    the (heavy) set arrays are never shuffled or duplicated in a shuffle
    file — a dup-dense corpus puts one doc in thousands of pairs.  Turn
    it off when the involved-doc set outgrows executor memory (extreme
    candidate volume); the plan degrades to a shuffle join.
    """
    # Lazy checkpoints: the candidate set feeds three plan legs (both
    # sides of `involved` plus the verify join) and the hash-set kernel
    # feeds two broadcast builds — without a materialization point the
    # whole upstream pipeline would replay per leg.  Lazy (not eager) so
    # building the DataFrame stays side-effect free.
    candidates = candidates.localCheckpoint(eager=False)
    involved = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        docs.join(involved, id_col, "left_semi")
        .select(
            F.col(id_col),
            shingle_hash_set_kernel(shingle_k)(F.col(text_col)).alias("sh"),
        )
        .localCheckpoint(eager=False)
    )
    if broadcast_sets:
        sh = F.broadcast(sh)
    # The candidate rows are skinny (two ids) but each drives an O(set)
    # intersect/union — spread them across the cluster with a PINNED
    # partition count: AQE sizes exchanges by BYTES and would coalesce
    # the post-distinct pairs to one partition, serializing the verify
    # compute (an explicit count is exempt from AQE re-coalescing).
    # Key on BOTH ids: sorted buckets emit a dup cluster's pairs with
    # the cluster minimum as id_a, so id_a alone would funnel a whole
    # cluster's verify work to one task.
    n_tasks = candidates.sparkSession.sparkContext.defaultParallelism
    candidates = candidates.repartition(n_tasks, F.col("id_a"), F.col("id_b"))
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
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Full near-dedup: LSH candidates → exact Jaccard → verified pairs.

    Duplicate-cluster resolution lives in
    :func:`gtfs_realtime_etl_spark.operators.clusters.connected_components`.
    """
    cands = minhash_lsh_candidates(
        docs, text_col, id_col, num_hashes, bands, shingle_k, max_bucket
    )
    return jaccard_pairs(docs, cands, text_col, id_col, shingle_k, threshold)


def simhash_from_hashes(hashes: Column, bits: int = H64_BITS) -> Column:
    """SimHash from a token-hash array (Column twin of the Arrow kernel).
    ``hashes`` should be a materialized attribute — this builds ``bits``
    vote aggregations that each reference it."""
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
    """Portable 62-bit polynomial hash of each whitespace token
    (array<bigint>; Column twin of the kernel's token hashing)."""
    return F.transform(tokens(text), token_hash64_column)


def simhash(text: Column, bits: int = H64_BITS) -> Column:
    """SimHash over whitespace tokens as a single Column expression.
    Prefer the fused Arrow kernel (functions/hashing.py) in hot paths —
    see simhash_dedup."""
    return simhash_from_hashes(token_hashes(text), bits)


def simhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_threshold: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``hamming_threshold``.

    Banded-segment LSH (the standard multi-table scheme): the 62-bit
    SimHash is split into ``hamming_threshold + 1`` equal-width segments;
    by pigeonhole, two hashes within the threshold agree exactly on at
    least one segment, so bucketing per (band_id, segment) finds every
    qualifying pair.  One shuffle on the bucket key; per-bucket pair
    explosion is bounded by ``max_bucket``; cross-band duplicates are
    removed by the final distinct.  Recall is exact by pigeonhole UP TO
    the bucket cap: a duplicate group larger than ``max_bucket`` (e.g.
    >1000 identical boilerplate docs) overflows its buckets in every
    band and contributes NO pairs — deliberately, because its pair
    explosion is quadratic; route such groups through
    :func:`exact_dedup` (which has no cap) and raise ``max_bucket``
    only with bounded cluster sizes.
    """
    bands = hamming_threshold + 1
    seg_bits = H64_BITS // bands  # trailing bits spill into the last segment
    sh = _saturate(docs).select(
        F.col(id_col),
        simhash_tokens_kernel()(tokens(F.col(text_col))).alias("simhash"),
    )
    segments = []
    for i in range(bands):
        lo = i * seg_bits
        width = (H64_BITS - lo) if i == bands - 1 else seg_bits
        segments.append(
            F.shiftrightunsigned("simhash", lo).bitwiseAND(
                F.lit((1 << width) - 1)
            )
        )
    banded = sh.select(
        id_col,
        "simhash",
        F.posexplode(F.array(*segments)).alias("band_id", "segment"),
    )
    buckets = (
        banded.groupBy("band_id", "segment")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), "simhash"))
            ).alias("rows")
        )
        .filter((F.size("rows") > 1) & (F.size("rows") <= max_bucket))
    )
    pair = _pair_explode(
        "rows",
        lambda x, y: [
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
        ],
    )
    return (
        buckets.select(pair.alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"), F.col("p.hamming"))
        .filter(F.col("hamming") <= hamming_threshold)
        .distinct()
    )


def winnow_fingerprints(text: Column, shingle_k: int = 5, window: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): the minimum shingle hash of every sliding window of
    ``window`` consecutive shingles, deduplicated.  Guarantees at least
    one fingerprint per (window + k - 1)-char span, so any sufficiently
    long shared substring yields a shared fingerprint — a positional
    dedup family complementing MinHash (whole-doc set similarity) and
    SimHash (weighted profile similarity).

    Pure Column math on the portable polynomial shingle hashes, so the
    oracle replays it token for token."""
    h = shingle_hashes_column(text, shingle_k)
    n = F.size(h)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(window - 1), F.lit(1)))
    wins = F.transform(starts, lambda i: F.array_min(F.slice(h, i, window)))
    return F.array_distinct(wins)


def winnow_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    use_kernel: bool = True,
) -> DataFrame:
    """Candidate pairs sharing >= ``min_shared`` winnowing fingerprints
    (id_a < id_b, with the shared-fingerprint count).

    Same scale skeleton as the other dedup families: explode doc ->
    fingerprints, ONE shuffle on the fingerprint, size-capped buckets
    (a boilerplate fingerprint shared by half the corpus is a stop
    word, not a join key), sorted pair explode, then an integer count
    per pair — no distinct-shuffle, no self-join.

    ``use_kernel=True`` (default) computes fingerprints with the fused
    Arrow kernel; the Column-twin path (``use_kernel=False``) exists
    for bit-parity tests — its nested HOF re-embeds the shingle-hash
    expression per window and is orders of magnitude slower on an
    untuned (ICU-on) session."""
    if use_kernel:
        from gtfs_realtime_etl_spark.functions.hashing import (
            winnow_fingerprints_kernel,
        )

        fp_col = winnow_fingerprints_kernel(shingle_k, window)(F.col(text_col))
    else:
        fp_col = winnow_fingerprints(F.col(text_col), shingle_k, window)
    fps = _saturate(docs).select(
        F.col(id_col), F.explode(fp_col).alias("fp")
    )
    buckets = (
        fps.groupBy("fp")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pair = _pair_explode("ids", lambda x, y: [x.alias("id_a"), y.alias("id_b")])
    return (
        buckets.select(pair.alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
