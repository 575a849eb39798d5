"""Content-defined chunking + partial-overlap dedup: Spark kernel vs the
shared chunker applied per-doc in plain Python, boundary-resync property,
and planted long-shared-span detection that whole-doc dedup misses."""

import pandas as pd

from uk_ner_presidio_demo_spark.operators.chunking import (
    doc_chunks, partial_overlap_pairs,
)
from uk_ner_presidio_demo_spark.semantics.chunking import (
    MAX_CHUNK, token_chunks,
)
from uk_ner_presidio_demo_spark.sources.tables import read_tpch

# a ~150-token shared span (deterministic word salad, no randomness)
_SHARED = " ".join(f"спільний{i % 37} фрагмент{i % 23}" for i in range(75))
_PREFIX = " ".join(f"шапка{i}" for i in range(60))
_SUFFIX = " ".join(f"хвіст{i}" for i in range(60))


def test_kernel_matches_python_twin_on_corpus(spark, sf01):
    docs = read_tpch(spark, sf01, "documents")
    got = doc_chunks(docs).toPandas()
    texts = pd.read_parquet(f"{sf01}/documents.parquet")[["doc_id", "text"]]
    want_rows = []
    for r in texts.itertuples(index=False):
        for idx, (s, e, h) in enumerate(token_chunks(r.text)):
            want_rows.append((r.doc_id, idx, s, e, h))
    want = pd.DataFrame(
        want_rows,
        columns=["doc_id", "chunk_idx", "start_tok", "end_tok",
                 "chunk_hash"],
    )
    key = ["doc_id", "chunk_idx"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s.astype(want_s.dtypes.to_dict()), want_s
    )


def test_chunks_cover_and_respect_max(spark):
    chunks = token_chunks(_PREFIX + " " + _SHARED)
    assert chunks[0][0] == 0
    for (s1, e1, _), (s2, e2, _) in zip(chunks, chunks[1:]):
        assert s2 == e1          # contiguous cover, no gaps
        assert e1 - s1 <= MAX_CHUNK
    assert chunks[-1][1] == len((_PREFIX + " " + _SHARED).split())


def test_boundaries_resync_after_different_prefixes():
    """The content-defined property: the same long span embedded after
    DIFFERENT prefixes must produce mostly identical chunk hashes."""
    a = {h for _, _, h in token_chunks(_PREFIX + " " + _SHARED)}
    b = {h for _, _, h in token_chunks(_SUFFIX + " " + _SHARED)}
    assert len(a & b) >= 2       # shared-span chunks resynchronized


def test_partial_overlap_detected_where_minhash_misses(spark):
    """A=prefix+shared, B=shared+suffix: low whole-doc Jaccard (different
    halves) but >=2 shared chunks -> partial-overlap pair found; the
    unrelated doc pairs with nothing."""
    from uk_ner_presidio_demo_spark.semantics.docsim import doc_jaccard

    doc_a = _PREFIX + " " + _SHARED
    doc_b = _SHARED + " " + _SUFFIX
    doc_c = " ".join(f"інше{i}" for i in range(120))
    assert doc_jaccard(doc_a, doc_b) < 0.8   # whole-doc dedup would skip
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["shared_chunks"]
             for r in partial_overlap_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)


def test_ubiquitous_chunks_are_dropped(spark):
    """max_chunk_df: a chunk present in every doc must not explode the
    join — with the cap at 2, a 4-doc-ubiquitous block yields no pairs."""
    block = " ".join(f"шаблон{i % 53} слово{i % 31}" for i in range(60))
    docs = spark.createDataFrame(
        [(i, block + " " + " ".join(f"унік{i}_{j}" for j in range(40)))
         for i in range(4)],
        "doc_id long, text string",
    )
    none = partial_overlap_pairs(docs, max_chunk_df=2).collect()
    assert none == []
    some = partial_overlap_pairs(docs, max_chunk_df=10).collect()
    assert some  # with the cap lifted the template block pairs everything


def test_lcs_span_dp_is_exact():
    from uk_ner_presidio_demo_spark.semantics.chunking import (
        longest_common_token_span,
    )

    assert longest_common_token_span("а б в г д", "х б в г у") == 3
    assert longest_common_token_span("а б", "в г") == 0
    assert longest_common_token_span("", "а") == 0
    assert longest_common_token_span("А б В", "а Б в") == 3  # case-folded


def test_verified_partial_overlap_confirms_span(spark):
    """The verify stage keeps the planted prefix+shared/shared+suffix pair
    (150-token common span) and reports a span >= the threshold; raising
    the threshold above the span kills it."""
    from uk_ner_presidio_demo_spark.operators.chunking import (
        verified_partial_overlaps,
    )

    docs = spark.createDataFrame(
        [(1, _PREFIX + " " + _SHARED), (2, _SHARED + " " + _SUFFIX),
         (3, " ".join(f"інше{i}" for i in range(120)))],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["common_span_tokens"]
           for r in verified_partial_overlaps(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 150
    assert not verified_partial_overlaps(
        docs, min_span_tokens=got[(1, 2)] + 1).collect()
