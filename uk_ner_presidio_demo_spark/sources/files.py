"""File ingestion sources (O-1/O-2/O-3) — the reference's upload path
(/root/reference/utils/file_handlers.py) restated for distributed ingest.

Everything reads through `spark.read.format("binaryFile")` so the encoding
decision happens per-file inside an Arrow-batched kernel (executors see raw
bytes; the driver never touches payloads):

TXT (`_read_txt`, reference file_handlers.py:107-183): UTF-8 first, then
chardet auto-detection when importable, then a cp1251 fallback — the exact
reference cascade, with chardet import-guarded (absent in this container,
matching the reference's optional middle step).

DOCX (`_read_docx`, reference file_handlers.py:185-223): a .docx is a zip
of XML — stdlib `zipfile` + `xml.etree` parse `word/document.xml`, take
each `w:p` paragraph's `w:t` text (tabs -> "\t", br/cr -> "\n", the
python-docx rendering), strip, drop empties, join with "\n\n".  No
python-docx needed.

Dispatch + guards (reference file_handlers.py:46-103): extension routes
{.txt -> cascade, .docx -> zip parse}, others rejected; the 50 MB upload
cap becomes a pushable predicate on binaryFile's `length` metadata column
(filtered before any byte leaves the scan), plus the per-document char
guard after decode.

Output is transcripts-shaped (conv_id = file name, turn_idx = 0) so the
whole detection DAG applies unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..semantics.registry import MAX_TEXT_LENGTH

MAX_FILE_CHARS = MAX_TEXT_LENGTH  # per-document guard
MAX_FILE_SIZE_BYTES = 50 * 1024 * 1024  # reference upload cap
SUPPORTED_EXTENSIONS = {".txt", ".docx"}

_DOCX_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def decode_text_bytes(raw: bytes) -> tuple[str, str]:
    """The reference's TXT encoding cascade (file_handlers.py:107-183):
    UTF-8 -> chardet (when importable) -> cp1251.  Returns (text, encoding);
    raises UnicodeDecodeError only if every step fails."""
    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    try:
        import chardet

        det = chardet.detect(raw)
        enc = det.get("encoding")
        if enc:
            try:
                return raw.decode(enc), enc.lower()
            except (UnicodeDecodeError, LookupError):
                pass
    except ImportError:
        pass  # optional middle step, same as the reference's try/except
    return raw.decode("cp1251"), "cp1251"


def docx_bytes_to_text(raw: bytes) -> str:
    """Paragraph text from .docx bytes via stdlib zip + XML — the
    reference's _read_docx semantics (file_handlers.py:185-223: paragraph
    `w:t` runs, strip, drop empties, join '\\n\\n')."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    paras = []
    for p in root.iter(f"{_DOCX_NS}p"):
        parts = []
        for node in p.iter():
            if node.tag == f"{_DOCX_NS}t":
                parts.append(node.text or "")
            elif node.tag == f"{_DOCX_NS}tab":
                parts.append("\t")
            elif node.tag in (f"{_DOCX_NS}br", f"{_DOCX_NS}cr"):
                parts.append("\n")
        paras.append("".join(parts).strip())
    return "\n\n".join(p for p in paras if p)


def parse_document_bytes(filename: str, raw: bytes) -> str:
    """Extension dispatch (O-3, reference file_handlers.py:73-82)."""
    ext = "." + filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    if ext == ".txt":
        return decode_text_bytes(raw)[0]
    if ext == ".docx":
        return docx_bytes_to_text(raw)
    raise ValueError(
        f"unsupported file format: {ext or '(none)'}; "
        f"supported: {sorted(SUPPORTED_EXTENSIONS)}"
    )


def _binary_to_transcripts(spark: SparkSession, path: str,
                           glob: str) -> DataFrame:
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        # 50 MB cap on file *metadata* — prunes before bytes move
        .filter(F.col("length") <= MAX_FILE_SIZE_BYTES)
        .select("path", "content")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                name = p.rsplit("/", 1)[-1]
                rows.append((name, parse_document_bytes(name, bytes(content))))
            yield pd.DataFrame(rows, columns=["conv_id", "text"])

    docs = raw.mapInPandas(kernel, "conv_id string, text string")
    return docs.select(
        "conv_id",
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    ).filter(F.length("text") <= MAX_FILE_CHARS)


def read_text_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .txt -> transcripts-shaped rows, with the full encoding
    cascade (conv_id=file, turn_idx=0, role='user', tool=null, ts=null)."""
    return _binary_to_transcripts(spark, path, "*.txt")


def read_docx_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .docx -> transcripts-shaped rows (stdlib zip+XML
    parser; no python-docx dependency)."""
    return _binary_to_transcripts(spark, path, "*.docx")


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Mixed-directory ingest with extension dispatch — the distributed
    restatement of the reference's FileHandler.read_file."""
    return _binary_to_transcripts(spark, path, "*.{txt,docx}")
