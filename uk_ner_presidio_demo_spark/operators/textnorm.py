"""Text normalization (O-4) — the reference's `sanitize_text`
(/root/reference/utils/file_handlers.py:278-320) as a pure Catalyst chain:

  1. CRLF / CR -> LF
  2. strip trailing spaces/tabs per line
  3. collapse runs of 3+ newlines to exactly two (max one blank line)
  4. strip leading/trailing whitespace of the whole text

NOTE (SURVEY.md §2.1 O-4): the reference applies this only on the
file-upload path, NOT inside analyze() — so the engine keeps it an optional
pre-stage and the per-turn text-equality invariant holds on the raw column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sanitize_text_col(col) -> Column:
    c = F.regexp_replace(col, r"\r\n?", "\n")
    c = F.regexp_replace(c, r"[ \t]+\n", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.regexp_replace(
        F.regexp_replace(c, r"^[\s]+", ""), r"[\s]+$", ""
    )


def normalize_turns(transcripts: DataFrame) -> DataFrame:
    return transcripts.select(
        "conv_id", "turn_idx",
        sanitize_text_col(F.col("text")).alias("norm_text"),
    )
