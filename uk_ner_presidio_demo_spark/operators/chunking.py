"""Partial-overlap (substring-level) dedup — content-defined chunk
fingerprints + equi-join blocking.  Catches documents sharing LONG SPANS
(boilerplate headers, quoted passages, template wrappers) that whole-doc
dedup never pairs: their MinHash similarity is low because the rest of
the text differs.

Scale shape: ONE mapInPandas crossing emits (doc_id, chunk_hash) rows
(~n_tokens / 2^BOUNDARY_BITS per doc), distinct-per-doc, then a
self-equi-join on chunk_hash and a pair-count aggregate — the same
blocked candidate pattern as the MinHash band join; never all-pairs.
Ubiquitous chunks (true boilerplate present in a large fraction of the
corpus) are dropped by `max_chunk_df` BEFORE the self-join — the hash
equivalent of a stop-word list — bounding join fan-out at web scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..semantics.chunking import longest_common_token_span, token_chunks

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("start_tok", T.IntegerType()),
        T.StructField("end_tok", T.IntegerType()),
        T.StructField("chunk_hash", T.StringType()),
    ]
)


def doc_chunks(docs: DataFrame) -> DataFrame:
    """Content-defined chunk table: (doc_id, chunk_idx, start_tok,
    end_tok, chunk_hash)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for idx, (s, e, h) in enumerate(token_chunks(text)):
                    rows.append((int(doc_id), idx, s, e, h))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "chunk_idx", "start_tok", "end_tok",
                         "chunk_hash"],
            )

    return docs.select("doc_id", "text").mapInPandas(kernel, CHUNKS_SCHEMA)


def partial_overlap_pairs(docs: DataFrame, min_shared: int = 2,
                          max_chunk_df: int = 1000) -> DataFrame:
    """(doc_a, doc_b, shared_chunks) for pairs sharing >= min_shared
    distinct chunk fingerprints.  min_shared=2 suppresses single-chunk
    coincidences; max_chunk_df drops corpus-ubiquitous chunks (document
    frequency above the cap) before the join."""
    ch = (
        doc_chunks(docs).select("doc_id", "chunk_hash").distinct()
        .localCheckpoint(eager=True)  # kernel once; join references twice
    )
    rare = ch.groupBy("chunk_hash").count() \
        .filter(F.col("count") <= max_chunk_df).select("chunk_hash")
    ch = ch.join(rare, "chunk_hash", "left_semi")
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= min_shared)
    )


@pandas_udf(T.IntegerType())
def _lcs_tokens_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [longest_common_token_span(x, y) for x, y in zip(a, b)]
    )


# pure, but nondeterministic-flagged so Catalyst evaluates the DP once
# instead of cloning it into the threshold Filter AND the output Project
# (the _doc_jaccard_udf lesson, operators/dedup.py)
_lcs_tokens_udf = _lcs_tokens_udf.asNondeterministic()


def verified_partial_overlaps(docs: DataFrame, min_span_tokens: int = 20,
                              min_shared: int = 2,
                              max_chunk_df: int = 1000) -> DataFrame:
    """(doc_a, doc_b, shared_chunks, common_span_tokens): chunk-blocked
    candidates confirmed by the EXACT longest-common-token-span DP —
    blocking finds, verification proves, exactly like bands -> Jaccard.
    The quadratic DP touches candidate pairs only."""
    cand = partial_overlap_pairs(docs, min_shared=min_shared,
                                 max_chunk_df=max_chunk_df)
    ta = docs.select(F.col("doc_id").alias("doc_a"),
                     F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"),
                     F.col("text").alias("text_b"))
    return (
        cand.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("common_span_tokens",
                    _lcs_tokens_udf("text_a", "text_b"))
        .filter(F.col("common_span_tokens") >= min_span_tokens)
        .select("doc_a", "doc_b", "shared_chunks",
                F.col("common_span_tokens").cast("long")
                .alias("common_span_tokens"))
    )
