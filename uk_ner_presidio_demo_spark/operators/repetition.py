"""Repetition-based quality signals (the Gopher/MassiveText repetition
filters, built from the public paper's description): per-document duplicate
word-3-gram fraction and top word-2-gram coverage — documents dominated by
repeated n-grams are boilerplate/spam and get filtered before training.

Scale shape: ONE mapInPandas crossing, zero shuffles.  The declarative
alternative (posexplode tokens -> window lead -> two groupBys) inflates the
row count by the mean token count (~56x here) and shuffles it twice — at
100 TB that's the dominant stage, while this kernel computes both signals
with a per-doc dict in a single scan.  Catalyst higher-order functions
could stay JVM-side but are interpreted (no codegen) and were measured
slower than Arrow kernels on this corpus shape (CLAUDE.md).

The pytest oracle is an INDEPENDENT DuckDB SQL implementation (list
comprehension over the token array), not a shared twin —
tests/test_repetition.py.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Java regex \s, matching size(split(trim(text), '\s+')) tokenization used
# across the textstats family.
_WS = re.compile(r"[ \t\n\x0B\f\r]+")

REPETITION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_3grams", T.LongType()),
        T.StructField("dup_3gram_frac", T.DoubleType()),
        T.StructField("n_2grams", T.LongType()),
        T.StructField("top_2gram_frac", T.DoubleType()),
    ]
)


def _doc_signals(doc_id: int, text: str) -> tuple:
    toks = _WS.split(text.strip(" "))
    g3 = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    g2 = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    n3, n2 = len(g3), len(g2)
    dup3 = 1.0 - len(set(g3)) / n3 if n3 else 0.0
    top2 = max(Counter(g2).values()) / n2 if n2 else 0.0
    return (doc_id, n3, dup3, n2, top2)


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_3grams, dup_3gram_frac, n_2grams, top_2gram_frac) —
    duplicate-3-gram fraction and most-frequent-2-gram coverage per doc
    (0.0 for docs too short to form the n-gram)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [_doc_signals(int(d), t)
                 for d, t in zip(pdf["doc_id"], pdf["text"])],
                columns=["doc_id", "n_3grams", "dup_3gram_frac",
                         "n_2grams", "top_2gram_frac"],
            )

    from .partitioning import fanout

    # fanout (r8): per-doc output is partitioning-independent; without
    # the spread a few-file corpus runs this n-gram kernel on one task
    # per file (partitioning.py)
    return fanout(docs.select("doc_id", "text")).mapInPandas(
        kernel, REPETITION_SCHEMA
    )


# Gopher-style keep thresholds (public paper's filter family; exact cut
# points tuned to this corpus's synthetic scale)
MAX_DUP_3GRAM_FRAC = 0.5
MAX_TOP_2GRAM_FRAC = 0.3


def repetition_keep(docs: DataFrame) -> DataFrame:
    """Docs passing both repetition filters — composable with
    textstats.quality_score / lang_id legs in clean_corpus."""
    from pyspark.sql import functions as F

    stats = repetition_stats(docs)
    keep = stats.filter(
        (F.col("dup_3gram_frac") <= MAX_DUP_3GRAM_FRAC)
        & (F.col("top_2gram_frac") <= MAX_TOP_2GRAM_FRAC)
    ).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")
