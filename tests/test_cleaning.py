"""Unit tests for functions/cleaning.py and the textstats additions
(hashed linear quality model, inverted index) against independent
pure-Python recomputations."""

import hashlib

from pyspark.sql import functions as F

from pdf_parser_spark.engine.corpus import wrap_lines
from pdf_parser_spark.functions import cleaning, textstats


def test_wrap_chunks_matches_corpus_wrap_lines(spark):
    texts = [
        "one two three",
        " ".join(f"tok{i}" for i in range(30)),
        "a\nb\tc   d",
        "solo",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["c"]
        for r in df.select(cleaning.wrap_chunks("text").alias("c")).collect()
    ]
    assert got == [wrap_lines(t) for t in texts]


def test_line_dedup_strikes_frequent_lines_keeps_order(spark):
    rows = [
        (0, ["boiler", "alpha", "beta"]),
        (1, ["boiler", "gamma"]),
        (2, ["delta", "boiler"]),
        (3, ["epsilon"]),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lines array<string>")
    out = {
        r["doc_id"]: r
        for r in cleaning.line_dedup(df, min_doc_freq=3).collect()
    }
    assert out[0]["clean_text"] == "alpha\nbeta"
    assert out[0]["n_kept"] == 2 and out[0]["n_dropped"] == 1
    assert out[1]["clean_text"] == "gamma"
    assert out[2]["clean_text"] == "delta"  # order preserved, not 'boiler'
    assert out[3]["clean_text"] == "epsilon" and out[3]["n_dropped"] == 0


def test_line_dedup_doc_freq_is_distinct_docs(spark):
    # the same line twice in ONE doc must not count as df=2
    rows = [(0, ["dup", "dup"]), (1, ["other"])]
    df = spark.createDataFrame(rows, "doc_id bigint, lines array<string>")
    out = {
        r["doc_id"]: r
        for r in cleaning.line_dedup(df, min_doc_freq=2).collect()
    }
    assert out[0]["clean_text"] == "dup\ndup" and out[0]["n_dropped"] == 0


def test_decontaminate_flags_quoting_docs(spark):
    phrase = "the quick brown fox jumps over the lazy dog"
    grams = cleaning.benchmark_shingles([phrase], k=5)
    assert "the quick brown fox jumps" in grams
    bench = spark.createDataFrame([(g,) for g in grams], "gram string")
    docs = spark.createDataFrame(
        [
            (0, "clean document with ordinary words " * 2),
            (1, f"prefix text {phrase} suffix text"),
            (2, "tiny"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in cleaning.decontaminate(docs, bench).collect()
    }
    assert out[0]["contaminated"] == 0
    assert out[1]["contaminated"] == 1 and out[1]["bench_ngrams"] == len(grams)
    assert out[2]["contaminated"] == 0  # sub-k-token doc still present


def test_nfc_normalize_composes(spark):
    df = spark.createDataFrame(
        [("café",), ("naïve",), ("ascii",), (None,)],
        "raw string",
    )
    got = [
        r["n"]
        for r in df.select(
            cleaning.nfc_normalize_col("raw").alias("n")
        ).collect()
    ]
    assert got == ["café", "naïve", "ascii", None]


def _py_mq_score(text: str) -> int:
    toks = [t for t in text.replace("\n", " ").replace("\t", " ").split(" ") if t]
    s = 0
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        s += int(h[:4], 16) % 997 - 498
    return s


def test_model_quality_score_matches_python_twin(spark):
    texts = ["the quick brown fox", "zzz qqq", "", "one one one"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["s"]
        for r in df.select(
            textstats.model_quality_score("text").alias("s")
        ).collect()
    ]
    assert got == [_py_mq_score(t) for t in texts]


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(
        [(10, "apple banana"), (3, "banana apple banana"), (7, "cherry")],
        "doc_id bigint, text string",
    )
    out = {
        r["term"]: r
        for r in textstats.inverted_index(
            docs, min_doc_freq=1, max_postings=2
        ).collect()
    }
    assert out["apple"]["postings"] == "3,10"
    assert out["banana"]["doc_freq"] == 2  # within-doc repeat not counted
    assert out["cherry"]["postings"] == "7"


def test_inverted_index_caps_postings_reports_full_df(spark):
    docs = spark.createDataFrame(
        [(i, "common") for i in range(5)], "doc_id bigint, text string"
    )
    row = textstats.inverted_index(
        docs, min_doc_freq=1, max_postings=2
    ).collect()[0]
    assert row["doc_freq"] == 5 and row["postings"] == "0,1"


def test_pack_sequences_prefix_sum_and_straddle(spark):
    from pdf_parser_spark.functions import packing

    docs = spark.createDataFrame(
        [(0, "h", " ".join(["t"] * 6)), (16, "h", " ".join(["t"] * 5)),
         (32, "h", " ".join(["t"] * 4)), (1, "h", " ".join(["t"] * 9))],
        "doc_id bigint, host string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in packing.pack_sequences(docs, seq_len=8, n_shards=16).collect()
    }
    # shard 0 chain: doc 0 (6 toks) -> doc 16 starts at 6 (straddles the
    # 8-token boundary: seq 0 offset 6) -> doc 32 starts at 11 (seq 1)
    assert out[0]["token_start"] == 0 and out[0]["seq_id"] == 0
    assert out[16]["token_start"] == 6
    assert out[16]["seq_id"] == 0 and out[16]["seq_offset"] == 6
    assert out[32]["token_start"] == 11
    assert out[32]["seq_id"] == 1 and out[32]["seq_offset"] == 3
    # doc 1 is shard 1: its own chain
    assert out[1]["token_start"] == 0


def test_mix_corpus_binding_stratum_keeps_all(spark):
    from pdf_parser_spark.functions import sampling

    rows = [(i, "en", "w " * 10) for i in range(40)] + [
        (100 + i, "de", "w " * 10) for i in range(2)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    # weights want 1:1 but de has only 2 docs -> de binds: keep all de,
    # downsample en toward ~2 docs (hash-grid rounding allowed)
    out = sampling.mix_corpus(df, {"en": 1, "de": 1}).collect()
    langs = [r["lang"] for r in out]
    assert langs.count("de") == 2
    assert 0 < langs.count("en") < 40


def test_mix_corpus_drops_unlisted_strata(spark):
    from pdf_parser_spark.functions import sampling

    df = spark.createDataFrame(
        [(0, "en", "a b c"), (1, "xx", "a b c")],
        "doc_id bigint, lang string, text string",
    )
    out = sampling.mix_corpus(df, {"en": 1}).collect()
    assert [r["lang"] for r in out] == ["en"]


def test_duplicate_substring_spans_maximal_runs(spark):
    from pdf_parser_spark.functions import dedup

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (0, f"unique0 words here {shared} tail0 x y"),
            (1, f"{shared} other1 stuff1 here1 now1 too1"),
            (2, "completely different text with no overlap at all ok"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        (r["doc_id"], r["span_start"]): r["span_len"]
        for r in dedup.duplicate_substring_spans(docs, k=5).collect()
    }
    # doc 0: shared run starts at token 3, doc 1: at token 0; both len 7
    assert out == {(0, 3): 7, (1, 0): 7}


def test_unigram_surprisal_matches_python(spark):
    import math

    from pdf_parser_spark.functions import textstats

    corpus = {0: "a a b", 1: "a c"}
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id bigint, text string"
    )
    tf = {"a": 3, "b": 1, "c": 1}
    n = 5
    surp = {t: round(math.log(n / c) * 1e6) for t, c in tf.items()}
    out = {
        r["doc_id"]: r for r in textstats.unigram_surprisal(docs).collect()
    }
    exp0 = surp["a"] * 2 + surp["b"]
    assert out[0]["surprisal"] == exp0
    assert out[0]["avg_surprisal"] == exp0 // 3
    assert out[1]["surprisal"] == surp["a"] + surp["c"]


def test_paragraph_dedup_first_occurrence_wins(spark):
    # 'shared' appears in docs 0, 1, 2 — only doc 0 (min doc_id) keeps
    # it; 'twice' repeats within doc 1 — only the first pos survives.
    rows = [
        (0, ["shared", "alpha"]),
        (1, ["twice", "shared", "twice"]),
        (2, ["beta", "shared"]),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, paras array<string>")
    out = {
        r["doc_id"]: r for r in cleaning.paragraph_dedup(df).collect()
    }
    assert out[0]["clean_text"] == "shared\n\nalpha"
    assert out[0]["n_kept"] == 2 and out[0]["n_dropped"] == 0
    assert out[1]["clean_text"] == "twice"
    assert out[1]["n_kept"] == 1 and out[1]["n_dropped"] == 2
    assert out[2]["clean_text"] == "beta"
    assert out[2]["n_kept"] == 1 and out[2]["n_dropped"] == 1


def test_paragraph_dedup_pos_breaks_tie_within_doc(spark):
    # same paragraph at pos 0 and pos 2 of ONE doc: pos 0 is keeper
    rows = [(5, ["p", "mid", "p"])]
    df = spark.createDataFrame(rows, "doc_id bigint, paras array<string>")
    (r,) = cleaning.paragraph_dedup(df).collect()
    assert r["clean_text"] == "p\n\nmid" and r["n_dropped"] == 1


def test_gopher_rules_fractions_and_pass_flag(spark):
    from pdf_parser_spark.functions import filtering

    good = ["plain words here"] * 20  # no bullets, no ellipsis
    rows = [
        (0, good),
        (1, ["- bullet line"] * 4 + ["tail words"]),  # 80% bullets
        (2, ["ends with dots ..."] * 2 + ["clean line"] * 2),  # 50% ellipsis
        (3, ["1 22 333 4444"]),  # zero alpha words
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lines array<string>")
    out = {
        r["doc_id"]: r
        for r in filtering.gopher_rules(df, min_words=3).collect()
    }
    assert out[0]["bullet_frac_e6"] == 0 and out[0]["ellipsis_frac_e6"] == 0
    assert out[0]["passes"] is True
    assert out[1]["bullet_frac_e6"] == 800000  # 4/5 exactly, integer div
    assert out[1]["passes"] is False
    assert out[2]["ellipsis_frac_e6"] == 500000
    assert out[2]["passes"] is False
    assert out[3]["alpha_frac_e6"] == 0 and out[3]["passes"] is False
    # mean word length is ppm of an exact integer ratio: doc 3 has
    # words 1,22,333,4444 -> 10 chars / 4 words = 2.5 -> 2_500_000
    assert out[3]["mean_word_len_e6"] == 2500000


def test_paragraph_dedup_kept_equals_corpus_distinct(spark):
    # corpus invariant: exactly one occurrence of every distinct
    # paragraph survives, so sum(n_kept) == |distinct paragraphs|
    rows = [(i, [f"p{(i * 3 + j) % 5}" for j in range(i % 4 + 1)]) for i in range(8)]
    distinct = {p for _, ps in rows for p in ps}
    total = sum(len(ps) for _, ps in rows)
    df = spark.createDataFrame(rows, "doc_id bigint, paras array<string>")
    out = cleaning.paragraph_dedup(df).collect()
    assert sum(r["n_kept"] for r in out) == len(distinct)
    assert sum(r["n_kept"] + r["n_dropped"] for r in out) == total
