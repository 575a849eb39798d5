"""Interactive-review operators: selective (index-filtered) anonymization
(O-9) and highlight segmentation (F-2).

The reference's two-phase review (detect -> human confirms a subset ->
anonymize only confirmed spans, /root/reference/ui/interactive_review.py:
289-352 with the index filter at :313-317) proves detection and
anonymization are separable operators sharing the mentions IR.  Here the
confirmation set arrives as a DataFrame of (conv_id, turn_idx, mention_idx)
keys and the filter is a LEFT-SEMI JOIN (J-6) — the distributed restatement
of the reference's index check.

Highlight segmentation (/root/reference/ui/interactive_review.py:356-386)
splits each turn into alternating (chunk, label) runs; here it lands as one
row per segment via a vectorized kernel sharing the span bookkeeping with
the splice.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..semantics.anonymize import splice

SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("seg_idx", T.IntegerType()),
        T.StructField("chunk", T.StringType()),
        T.StructField("label", T.StringType()),  # entity_type or null
    ]
)


def confirmed_mentions(mentions: DataFrame, confirmed: DataFrame) -> DataFrame:
    """O-9: keep only confirmed mention keys — left-semi join."""
    return mentions.join(
        confirmed, on=["conv_id", "turn_idx", "mention_idx"], how="left_semi"
    )


def rejected_mentions(mentions: DataFrame, confirmed: DataFrame) -> DataFrame:
    """J-6 anti twin: the rows a reviewer rejected (metrics/audit)."""
    return mentions.join(
        confirmed, on=["conv_id", "turn_idx", "mention_idx"], how="left_anti"
    )


def selective_anonymize(turns: DataFrame, kept_mentions: DataFrame) -> DataFrame:
    """Splice ONLY the kept spans back into the turn text.

    Spans arrive pre-resolved (non-overlapping), so the rewrite is a
    per-turn grouped splice: collect the kept spans per turn JVM-side,
    then one vectorized pass.  Turns with zero kept spans pass through
    identity (the reference's empty-result behavior)."""
    spans = (
        kept_mentions.groupBy("conv_id", "turn_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("start", "end", "entity_type"))
            ).alias("spans")
        )
    )
    joined = turns.select("conv_id", "turn_idx", "text").join(
        spans, on=["conv_id", "turn_idx"], how="left"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_id, turn_idx, text, spans_v in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["spans"]
            ):
                if spans_v is None or len(spans_v) == 0:
                    out.append((conv_id, turn_idx, text))
                    continue
                triple = [(s["entity_type"], int(s["start"]), int(s["end"]))
                          for s in spans_v]
                out.append((conv_id, turn_idx, splice(text, triple)))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "anonymized_text"]
            )

    return joined.mapInPandas(
        kernel,
        "conv_id string, turn_idx int, anonymized_text string",
    )


def highlight_segments(turns: DataFrame, mentions: DataFrame) -> DataFrame:
    """F-2: one row per (chunk, label) run of each turn."""
    spans = (
        mentions.groupBy("conv_id", "turn_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("start", "end", "entity_type"))
            ).alias("spans")
        )
    )
    joined = turns.select("conv_id", "turn_idx", "text").join(
        spans, on=["conv_id", "turn_idx"], how="inner"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_id, turn_idx, text, spans_v in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["spans"]
            ):
                pos = 0
                seg = 0
                for s in spans_v:
                    st, en, et = int(s["start"]), int(s["end"]), s["entity_type"]
                    if st > pos:
                        out.append((conv_id, turn_idx, seg, text[pos:st], None))
                        seg += 1
                    out.append((conv_id, turn_idx, seg, text[st:en], et))
                    seg += 1
                    pos = en
                if pos < len(text):
                    out.append((conv_id, turn_idx, seg, text[pos:], None))
            yield pd.DataFrame(
                out,
                columns=["conv_id", "turn_idx", "seg_idx", "chunk", "label"],
            )

    return joined.mapInPandas(kernel, SEGMENTS_SCHEMA)
