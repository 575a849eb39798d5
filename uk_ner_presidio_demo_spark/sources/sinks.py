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


def render_anonymized_md(anonymized_text: str,
                         metadata: dict | None = None) -> str:
    """Markdown export of an anonymized document — the reference's
    `_export_markdown` shape (file_exporters.py:365-385): title, metadata
    in a code fence, horizontal rule, then the text."""
    lines = []
    if metadata:
        meta = "\n".join(f"{k}: {v}" for k, v in metadata.items())
        lines.extend(
            ["# Анонімізований документ", "", "```", meta, "```", "", "---",
             ""]
        )
    lines.append(anonymized_text)
    return "\n".join(lines)


def render_report_md(anonymized_text: str, entities: list[dict],
                     stats: dict | None = None) -> str:
    """Full Markdown report — the reference's `_export_full_report_md`
    shape (file_exporters.py:387-450): stats table, anonymized text,
    entities grouped by type, numbered and position-sorted.  entities rows
    need (entity_type, surface, start, end, score)."""
    lines = ["# Звіт про деідентифікацію", "", "## Статистика", ""]
    lines.append("| Показник | Значення |")
    lines.append("|----------|----------|")
    for key, value in (stats or {"Сутностей": len(entities)}).items():
        lines.append(f"| {key} | {value} |")
    lines.extend(
        ["", "---", "", "## Анонімізований текст", "", anonymized_text,
         "", "---", "", "## Виявлені сутності", ""]
    )
    if not entities:
        lines.append("✓ Персональних даних не виявлено")
    else:
        by_type: dict[str, list[dict]] = {}
        for e in entities:
            by_type.setdefault(e["entity_type"], []).append(e)
        for etype, es in sorted(by_type.items()):
            lines.append(f"### {etype} ({len(es)} знайдено)")
            lines.append("")
            for idx, e in enumerate(sorted(es, key=lambda x: x["start"]), 1):
                lines.append(
                    f"{idx}. **'{e['surface']}'** "
                    f"[позиція {e['start']}-{e['end']}, "
                    f"впевненість {e['score']:.0%}]"
                )
            lines.append("")
    return "\n".join(lines)


def write_reports_md(detected_mentions: DataFrame, anonymized: DataFrame,
                     path: str) -> None:
    """Distributed MD export: one report per conversation, written as a
    (conv_id, report_md) table.  The render itself is a per-group pandas
    op (small groups by construction); the heavy work — detection,
    anonymization — already happened upstream."""
    import pandas as pd

    ment = detected_mentions.select(
        "conv_id", "entity_type", "surface", "start", "end", "score"
    )
    anon = anonymized.groupBy("conv_id").agg(
        F.concat_ws(
            "\n\n", F.array_sort(F.collect_list(F.struct("turn_idx",
                                                         "anonymized_text")))
            .getField("anonymized_text")
        ).alias("full_text")
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        text = pdf["full_text"].iloc[0]
        ents = pdf.dropna(subset=["entity_type"]).to_dict("records")
        return pd.DataFrame(
            {"conv_id": [conv], "report_md": [render_report_md(text, ents)]}
        )

    joined = anon.join(ment, "conv_id", "left")
    (
        joined.groupBy("conv_id")
        .applyInPandas(render, "conv_id string, report_md string")
        .write.mode("overwrite")
        .json(path)
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
