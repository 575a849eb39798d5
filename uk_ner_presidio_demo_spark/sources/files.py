"""File ingestion sources (O-1/O-2/O-3) — the reference's upload path
(/root/reference/utils/file_handlers.py) restated for distributed ingest.

TXT: `spark.read.text(wholetext)` over a directory; one document per file,
mapped onto the transcripts shape (conv_id = file name, turn_idx = 0) so the
whole detection DAG applies unchanged.  Encoding note: Spark reads UTF-8;
the reference's chardet/cp1251 cascade handled desktop uploads — at table
scale, upstream ingest owns transcoding (SURVEY.md §2.1 O-1), and a
per-file size guard replaces the 50 MB upload cap.

DOCX: requires python-docx, absent in this container — import-guarded STUB
(clearly marked, same pattern as the multimodal decoder): the distributed
plumbing is the same `(path, text)` shape once a parser is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..semantics.registry import MAX_TEXT_LENGTH

MAX_FILE_CHARS = MAX_TEXT_LENGTH  # per-document guard, mirrors the 50MB cap


def read_text_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .txt -> transcripts-shaped rows
    (conv_id=file, turn_idx=0, role='user', tool=null, ts=mtime-less)."""
    raw = (
        spark.read.option("wholetext", True)
        .text(path)
        .withColumn("conv_id", F.regexp_extract(F.input_file_name(),
                                                r"([^/]+)$", 1))
    )
    return raw.select(
        "conv_id",
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    ).filter(F.length("text") <= MAX_FILE_CHARS)


def read_docx_files(spark: SparkSession, path: str) -> DataFrame:
    """DOCX ingest — STUB: python-docx is not available in this
    environment.  A real implementation reads each file binary
    (spark.read.format('binaryFile')), extracts paragraph text in a
    mapInPandas kernel (join with '\\n\\n', drop empties — the reference's
    _read_docx semantics), and lands on the same transcripts shape."""
    try:
        import docx  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "DOCX parsing requires python-docx, which is not installed in "
            "this environment; see docstring for the wired-up shape."
        ) from e
    raise NotImplementedError("real DOCX path intentionally unwired")
