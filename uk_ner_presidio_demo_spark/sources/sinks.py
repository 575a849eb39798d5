"""Export sinks (O-S1..O-S3, O-S5) — the reference's per-document exporters
(/root/reference/utils/file_exporters.py) restated as distributed table
writes plus one driver-side report renderer.

| reference | here |
|---|---|
| entities JSON (sorted by start, O-S2) | `write_mentions_json` — per-turn ordered JSON lines |
| entities CSV (type,text,start,end,score%, O-S3) | `write_mentions_csv` — header CSV |
| anonymized TXT (O-S1) | `write_anonymized_json` — newline-safe lines sink |
| full report DOCX (O-S4) | replaced by the nodes/edges/metrics parquet tables (pipeline) [north-rule] |
| timestamped filename (O-S5) | `run_output_dir` |
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_output_dir(base: str, prefix: str = "export") -> str:
    """O-S5: timestamped run directory (driver-side)."""
    stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    p = Path(base) / f"{prefix}_{stamp}"
    p.mkdir(parents=True, exist_ok=True)
    return str(p)


def write_mentions_json(mentions: DataFrame, path: str) -> None:
    """O-S2: entity rows sorted by position, JSON-lines."""
    (
        mentions.orderBy("conv_id", "turn_idx", "start")
        .write.mode("overwrite").json(path)
    )


def write_mentions_csv(mentions: DataFrame, path: str) -> None:
    """O-S3: (type, text, start, end, score_pct) with header — the
    reference's CSV column shape (file_exporters.py:226-255)."""
    (
        mentions.select(
            F.col("entity_type").alias("type"),
            F.col("surface").alias("text"),
            "start",
            "end",
            F.round(F.col("score") * 100, 1).alias("score_pct"),
        )
        .orderBy("type", "text", "start")
        .write.mode("overwrite").option("header", True).csv(path)
    )


def write_anonymized_json(anonymized: DataFrame, path: str) -> None:
    """O-S1: anonymized turns; JSON-lines keeps embedded newlines intact
    (a plain text sink would corrupt multi-line turns)."""
    (
        anonymized.orderBy("conv_id", "turn_idx")
        .write.mode("overwrite").json(path)
    )


def render_report_txt(stats_rows: list[dict], path: str) -> None:
    """Driver-side summary report (the TXT/MD export header shape:
    timestamp + per-type stats), for aggregates already collected."""
    lines = [
        "# Analysis report",
        f"generated_at: {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}",
        "",
    ]
    for row in stats_rows:
        lines.append("  ".join(f"{k}={v}" for k, v in row.items()))
    Path(path).write_text("\n".join(lines) + "\n")
