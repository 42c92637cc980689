"""BPE trainer unit semantics: greedy fold, ordering, encode path.

The cross-engine hash gate (test_oracle_parity: bpe_train /
bpe_encode_stats) proves Spark == DuckDB on the corpus; these tests
pin the OPERATOR semantics on adversarial micro-fixtures where the
classic BPE corner cases live (overlap runs, shared boundaries,
multi-char symbol false suffixes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.operators.bpe import (
    _adjacent_pairs,
    _symbols,
    apply_merges,
    bpe_train,
    merge_fold,
    word_dictionary,
)


def _fold_all(spark, words: list[str], lhs: str, rhs: str) -> dict[str, str]:
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", F.regexp_replace("w", "(.)", " $1").alias("s")
    )
    out = df.select("w", merge_fold(_symbols(F.col("s")), lhs, rhs).alias("m"))
    return {r.w: r.m for r in out.collect()}


def test_merge_fold_greedy_left_to_right(spark):
    # Non-overlapping occurrences all merge; overlap runs resolve
    # left-to-right; merged tails never re-match the rule.
    m = _fold_all(spark, ["abab", "aab", "ba", "b"], "a", "b")
    assert m == {"abab": " ab ab", "aab": " a ab", "ba": " b a", "b": " b"}
    m = _fold_all(spark, ["aaa", "aaaa", "baa"], "a", "a")
    assert m == {"aaa": " aa a", "aaaa": " aa aa", "baa": " b aa"}


def test_merge_fold_multichar_symbol_boundaries(spark):
    # After (x,l) merges to "xl", the (l,l) rule must NOT fire on the
    # "l" suffix of "xl" — the space sentinel keeps whole-symbol
    # identity.
    df = spark.createDataFrame([("xllo",)], "w string").select(
        F.regexp_replace("w", "(.)", " $1").alias("s")
    )
    step1 = df.select(merge_fold(_symbols(F.col("s")), "x", "l").alias("s"))
    step2 = step1.select(merge_fold(_symbols(F.col("s")), "l", "l").alias("s"))
    assert step2.collect()[0].s == " xl l o"


def test_adjacent_pairs_single_symbol_word(spark):
    # A fully merged (1-symbol) word yields NO pairs — guards the
    # descending-sequence trap (sequence(1, 0) == [1, 0]).
    df = spark.createDataFrame([(" x",), (" a b",)], "s string")
    out = df.select(_adjacent_pairs(_symbols(F.col("s"))).alias("p"))
    assert [r.p for r in out.collect()] == [[], ["a b"]]


def test_bpe_train_rank_order_and_counts(spark):
    # Corpus tokens: the×4, cat, hat.  (t,h) and (h,e) tie at 4 — the
    # lexicographically smaller pair "h e" wins round 1; round 2 then
    # merges (t,he).  Counts are corpus token frequencies, not
    # dictionary rows.
    docs = spark.createDataFrame(
        [("the the the cat",), ("the hat",)], "text string"
    )
    merges = bpe_train(docs, n_merges=2)
    assert [(m["lhs"], m["rhs"], m["pair_count"]) for m in merges] == [
        ("h", "e", 4),
        ("t", "he", 4),
    ]
    assert [m["merge_rank"] for m in merges] == [1, 2]


def test_apply_merges_encodes_training_dictionary(spark):
    # After (h,e) then (t,he): "the" → one symbol; "hat"/"cat" untouched.
    docs = spark.createDataFrame(
        [("the the the cat",), ("the hat",)], "text string"
    )
    merges = bpe_train(docs, n_merges=2)
    enc = word_dictionary(docs).select(
        apply_merges(F.col("s"), merges).alias("s")
    )
    got = sorted(r.s for r in enc.collect())
    assert got == [" c a t", " h a t", " the"]
