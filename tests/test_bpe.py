"""Corpus BPE tokenizer induction: deterministic trainer spec, engine
vs single-process twin equality, bounded-collect corpus-size
independence, and the compression property."""

import pandas as pd
import pytest

from uk_ner_presidio_demo_spark.operators.bpe import (
    bpe_token_counts, bpe_train, word_counts,
)
from uk_ner_presidio_demo_spark.semantics.bpe import (
    encode_text, encode_word, merge_pair, train_bpe_from_counts, ws_tokens,
)


class TestTrainerSpec:
    def test_hand_checked_tiny_example(self):
        # 'aaab' x10, 'aab' x5: pair ('a','a') dominates (10*2 + 5*1 = 25
        # overlap-counted), merged first; then ('aa','ab')? — after merge
        # 'aaab'->['aa','ab'? no: left-to-right pass gives ['aa','a','b']
        wc = [("aaab", 10), ("aab", 5)]
        merges = train_bpe_from_counts(wc, n_merges=2)
        assert merges[0] == ("a", "a")
        assert merge_pair(list("aaab"), ("a", "a")) == ["aa", "a", "b"]
        # second merge: pairs now ('aa','a')x10, ('a','b')x10+... recount:
        # 'aaab'->['aa','a','b']: ('aa','a'),( 'a','b'); 'aab'->['aa','b']:
        # ('aa','b').  Counts: ('aa','a')=10, ('a','b')=10, ('aa','b')=5 —
        # tie 10/10 broken lexicographically: ('a','b') < ('aa','a')
        assert merges[1] == ("a", "b")

    def test_encoding_replays_merges_in_order(self):
        merges = [("a", "a"), ("a", "b")]
        assert encode_word("aaab", merges) == ["aa", "ab"]
        assert encode_word("aab", merges) == ["aa", "b"]
        assert encode_word("xyz", merges) == ["x", "y", "z"]
        assert encode_text("aaab  aab", merges) == ["aa", "ab", "aa", "b"]

    def test_no_repeating_pair_stops_early(self):
        merges = train_bpe_from_counts([("abc", 1), ("def", 1)], 10)
        assert merges == []  # every pair occurs once: nothing to learn

    def test_trainer_is_deterministic_under_input_order(self):
        wc = [("слово", 7), ("словом", 3), ("мова", 5), ("мовою", 2)]
        m1 = train_bpe_from_counts(wc, 8)
        m2 = train_bpe_from_counts(list(reversed(wc)), 8)
        assert m1 == m2 and len(m1) > 0


def test_word_counts_matches_pandas(spark, sf01):
    got = word_counts(
        spark.read.parquet(f"{sf01}/documents.parquet")
    ).toPandas().set_index("word")["count"].sort_index()
    docs = pd.read_parquet(f"{sf01}/documents.parquet")
    want = (
        pd.Series([w for t in docs["text"] for w in ws_tokens(t)])
        .value_counts().sort_index()
    )
    assert (got == want).all() and len(got) == len(want)


def test_tokenizer_parity_on_unicode_whitespace(spark):
    """The frozen tokenizer (ADVICE r5 #2): Spark's Java split '\\s+' in
    word_counts and Python ws_tokens in the encode kernel / oracle twin
    must be the SAME character class — NBSP (\\u00a0), ideographic space
    (\\u3000), and \\x1c (Python-isspace but not Java-\\s) all stay
    INSIDE tokens on both sides."""
    rows = [(0, "a\u00a0b c"), (1, "x\u3000y\tz"),
            (2, "p\x1cq r\u2029s"), (3, "  lead\ttrail\r\nend  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        word_counts(df).toPandas()
        .set_index("word")["count"].sort_index()
    )
    want = (
        pd.Series([w for _, t in rows for w in ws_tokens(t)])
        .value_counts().sort_index()
    )
    assert (got == want).all() and len(got) == len(want)
    assert "a\u00a0b" in got.index and "p\x1cq" in got.index


def test_engine_counts_match_single_process_twin(spark, sf01):
    docs_df = spark.read.parquet(f"{sf01}/documents.parquet")
    merges = bpe_train(docs_df, n_merges=32, max_words=2000)
    assert len(merges) > 0
    got = bpe_token_counts(docs_df, merges).toPandas() \
        .set_index("doc_id").sort_index()
    docs = pd.read_parquet(f"{sf01}/documents.parquet")
    for r in docs.itertuples(index=False):
        enc = encode_text(r.text, merges)
        row = got.loc[r.doc_id]
        assert row["n_ws_tokens"] == len(ws_tokens(r.text))
        assert row["n_bpe_tokens"] == len(enc)
    # compression property: trained merges shorten the stream vs chars
    # but never below the whitespace token count
    chars = docs["text"].map(lambda t: sum(len(w) for w in t.split()))
    assert (got["n_bpe_tokens"].to_numpy() < chars.to_numpy()).all()
    assert (got["n_bpe_tokens"].to_numpy()
            >= got["n_ws_tokens"].to_numpy()).all()


def test_more_merges_never_lengthen_the_encoding(spark, sf01):
    from pyspark.sql import functions as F

    docs_df = spark.read.parquet(f"{sf01}/documents.parquet")
    wc = [(r["word"], int(r["count"]))
          for r in word_counts(docs_df)
          .orderBy(F.desc("count"), F.asc("word")).limit(500).collect()]
    m_small = train_bpe_from_counts(wc, 8)
    m_big = train_bpe_from_counts(wc, 32)
    assert m_big[:len(m_small)] == m_small  # greedy prefix property
    docs = pd.read_parquet(f"{sf01}/documents.parquet").head(50)
    for t in docs["text"]:
        assert len(encode_text(t, m_big)) <= len(encode_text(t, m_small))


def test_training_collect_is_corpus_size_independent(spark):
    """The bounded-vocabulary collect (the ANN_Q pattern): growing the
    corpus 4x by replication changes neither the collected vocabulary
    size nor the trained merges (counts scale uniformly)."""
    rows = [(i, "альфа бета гамма дельта " * (i % 3 + 1))
            for i in range(200)]
    small = spark.createDataFrame(rows, "doc_id long, text string")
    big = spark.createDataFrame(rows * 4, "doc_id long, text string")
    m_small = bpe_train(small, n_merges=8, max_words=50)
    m_big = bpe_train(big, n_merges=8, max_words=50)
    assert m_small == m_big and len(m_small) > 0
