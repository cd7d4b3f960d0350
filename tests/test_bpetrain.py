"""BPE merge-learning loop: greedy run-parity semantics and the
end-to-end trainer on a tiny corpus with a hand-computed answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parser_spark.functions import bpetrain


def _sym_words(spark, rows):
    words = spark.createDataFrame(rows, "word string, freq long")
    return bpetrain.initial_symbols(words)


def _word_syms(sym_df):
    out = {}
    for r in sym_df.orderBy("word", "pos").collect():
        out.setdefault(r["word"], []).append(r["s"])
    return out


def test_apply_merge_simple(spark):
    sym = _sym_words(spark, [("lower", 1)])
    got = _word_syms(bpetrain.apply_merge(sym, "l", "o"))
    assert got["lower"] == ["lo", "w", "e", "r"]


def test_apply_merge_greedy_run_parity(spark):
    # "aaaa" under (a,a): greedy left-to-right → aa + aa, never a|aa|a
    sym = _sym_words(spark, [("aaaa", 1), ("aaa", 1)])
    got = _word_syms(bpetrain.apply_merge(sym, "a", "a"))
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]


def test_apply_merge_renumbers_positions(spark):
    sym = _sym_words(spark, [("abab", 1)])
    merged = bpetrain.apply_merge(sym, "a", "b")
    rows = merged.where(F.col("word") == "abab").orderBy("pos").collect()
    assert [r["pos"] for r in rows] == [1, 2]
    assert [r["s"] for r in rows] == ["ab", "ab"]
    # a second round over the merged table works on the new symbols
    got = _word_syms(bpetrain.apply_merge(merged, "ab", "ab"))
    assert got["abab"] == ["abab"]


def test_learn_merges_hand_computed(spark):
    # corpus: "low" ×5, "lower" ×2 → pair counts:
    #   (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2 → round1 tie → (l,o) by text
    #   round2: (lo,w)=7 wins; round3: (low,e)=2 vs (e,r)=2 → (e,r)
    docs = spark.createDataFrame(
        [("low low low low low lower lower",)], "text string"
    )
    words = bpetrain.word_freq_table(docs)
    merges = bpetrain.learn_merges(words, n_merges=3)
    assert merges == [(1, "l", "o", 7), (2, "lo", "w", 7), (3, "e", "r", 2)]


def test_word_freq_table_filters_non_alpha(spark):
    docs = spark.createDataFrame([("Dog dog 42 x-y café",)], "text string")
    got = {
        r["word"]: r["freq"]
        for r in bpetrain.word_freq_table(docs).collect()
    }
    assert got == {"dog": 2}  # lowercased, digits/hyphen/accents dropped
