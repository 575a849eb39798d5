"""Corpus PII scrubbing — the reference's core capability (detect +
anonymize; core/analyzer.py:137-314 semantics via the frozen
semantics/detect + semantics/anonymize modules) applied to the TRAINING
CORPUS: pretraining pipelines scrub emails/phones/ids out of documents
before packing (the C4/Dolma PII-removal step), and this engine already
owns the recognizer stack, so the documents table gets the same
single-crossing treatment as transcripts.

Scale shape: ONE mapInPandas (the batch detection kernel + right-to-left
splice in the same crossing), zero shuffles, scan-local — identical to
the transcript detection invariant (plan-gated in tests/test_scrub.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..semantics.anonymize import splice
from ..semantics.detect import detect_mentions_batch
from .partitioning import fanout

SCRUB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pii", T.IntegerType()),
        T.StructField("scrubbed_text", T.StringType()),
    ]
)


def scrub_documents(docs: DataFrame,
                    strategy: str = "priority") -> DataFrame:
    """(doc_id, n_pii, scrubbed_text): every detected mention replaced by
    its [ENTITY_TYPE] tag; n_pii counts replacements so downstream
    quality filters can drop documents that were mostly PII."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [t if t is not None else "" for t in pdf["text"]]
            detected = detect_mentions_batch(texts, strategy=strategy)
            rows = []
            for doc_id, text, (mentions, _) in zip(
                pdf["doc_id"], texts, detected
            ):
                scrubbed = splice(
                    text,
                    [(m.entity_type, m.start, m.end) for m in mentions],
                )
                rows.append((int(doc_id), len(mentions), scrubbed))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_pii", "scrubbed_text"]
            )

    # fanout (r8): the detection kernel is the most CPU-expensive Arrow
    # pass in the repo, and a few-file corpus scan otherwise caps it at
    # one task per file (the r5 simhash fragility class; partitioning.py)
    return fanout(docs.select("doc_id", "text")).mapInPandas(
        kernel, SCRUB_SCHEMA
    )
