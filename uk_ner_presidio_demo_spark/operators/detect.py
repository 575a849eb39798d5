"""Fused mention detection + conflict resolution + anonymization (stage 3).

One `mapInPandas` pass per partition: NER surrogate + pattern scan + union +
sanitize + greedy resolution + splice, all inside a single Arrow crossing
(SURVEY.md §4.3 "one Arrow crossing for detection") — the turn text is
serialized JVM->Python exactly once, and the stage is narrow (no shuffle).

Output is per-TURN rows carrying the mention array (exploded downstream by
`mentions_from_turns`) plus the anonymized rewrite and a per-family error
flag (U-2 failure isolation -> metrics, never an exception).

Reference pipeline being restated: /root/reference/core/analyzer.py:91-197.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..semantics.anonymize import splice
from ..semantics.detect import detect_mentions
from ..semantics.registry import is_valid_text
from ..sources.tables import valid_text_predicate

MENTION_STRUCT = T.StructType(
    [
        T.StructField("mention_idx", T.LongType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("surface", T.StringType()),
        T.StructField("norm_surface", T.StringType()),
    ]
)

DETECTED_TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("anonymized_text", T.StringType()),
        T.StructField("detect_errors", T.IntegerType()),
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT)),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
    ]
    + MENTION_STRUCT.fields
)


def detect_turns(transcripts: DataFrame, strategy: str = "priority") -> DataFrame:
    """transcripts (conv_id, turn_idx, role, text, tool, ts) -> detected turns.

    Invalid rows (O-5) are filtered Catalyst-side before the Arrow boundary;
    the kernel re-checks the exact Python predicate for belt-and-braces
    parity with the oracle.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for conv_id, turn_idx, role, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["role"],
                pdf["text"], pdf["tool"],
            ):
                if not is_valid_text(text):
                    continue
                mentions, errors = detect_mentions(text, strategy=strategy)
                anonymized = splice(
                    text, [(m.entity_type, m.start, m.end) for m in mentions]
                )
                out_rows.append(
                    (
                        conv_id, turn_idx, role, tool, anonymized, errors,
                        [tuple(m) for m in mentions],
                    )
                )
            yield pd.DataFrame(
                out_rows, columns=[f.name for f in DETECTED_TURNS_SCHEMA.fields]
            )

    pruned = transcripts.filter(valid_text_predicate()).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )
    return pruned.mapInPandas(kernel, schema=DETECTED_TURNS_SCHEMA)


def mentions_from_turns(detected: DataFrame) -> DataFrame:
    """Explode the mention arrays into the long-format mentions table
    (conv_id, turn_idx, mention_idx, entity_type, start, end, score,
    surface, norm_surface) — the engine's central IR (SURVEY.md §1.2)."""
    m = detected.select(
        "conv_id", "turn_idx", F.explode("mentions").alias("m")
    )
    return m.select("conv_id", "turn_idx", "m.*")


def anonymized_turns(detected: DataFrame) -> DataFrame:
    return detected.select("conv_id", "turn_idx", "anonymized_text")
