"""Sink round-trips (O-S1..S3) and review-operator edge cases."""

import pandas as pd

from uk_ner_presidio_demo_spark.operators.detect import (
    detect_turns, mentions_from_turns,
)
from uk_ner_presidio_demo_spark.sources.sinks import (
    render_report_txt, run_output_dir, write_anonymized_json,
    write_mentions_csv, write_mentions_json,
)
from uk_ner_presidio_demo_spark.sources.tables import read_transcripts


def test_sink_roundtrips(spark, sf001, tmp_path):
    det = detect_turns(read_transcripts(spark, sf001))
    m = mentions_from_turns(det).cache()
    n = m.count()

    jp = str(tmp_path / "mentions_json")
    write_mentions_json(m, jp)
    assert spark.read.json(jp).count() == n

    cp = str(tmp_path / "mentions_csv")
    write_mentions_csv(m, cp)
    back = spark.read.option("header", True).csv(cp)
    assert back.count() == n
    assert back.columns == ["type", "text", "start", "end", "score_pct"]

    ap = str(tmp_path / "anon_json")
    from uk_ner_presidio_demo_spark.operators.detect import anonymized_turns

    a = anonymized_turns(det)
    write_anonymized_json(a, ap)
    assert spark.read.json(ap).count() == a.count()
    m.unpersist()


def test_report_and_run_dir(tmp_path):
    d = run_output_dir(str(tmp_path), "exp")
    assert "exp_" in d
    rp = str(tmp_path / "report.txt")
    render_report_txt([{"entity_type": "PERS", "n": 3}], rp)
    txt = open(rp).read()
    assert "entity_type=PERS" in txt and "# Analysis report" in txt


def test_render_anonymized_md_shape():
    """Mirrors the reference's test_export_markdown assertions
    (test/test_file_io.py:266-277): title + fenced metadata block."""
    from uk_ner_presidio_demo_spark.sources.sinks import render_anonymized_md

    md = render_anonymized_md("Текст з <PERS>.", {"Дата": "2026-08-16"})
    assert "# Анонімізований документ" in md
    assert "```" in md
    assert md.rstrip().endswith("Текст з <PERS>.")
    # without metadata: just the text (include_metadata=False branch)
    assert render_anonymized_md("x") == "x"


def test_render_report_md_groups_and_sorts():
    from uk_ner_presidio_demo_spark.sources.sinks import render_report_md

    ents = [
        {"entity_type": "PERS", "surface": "Іван", "start": 10, "end": 14,
         "score": 0.95},
        {"entity_type": "PERS", "surface": "Олег", "start": 0, "end": 4,
         "score": 0.9},
        {"entity_type": "LOC", "surface": "Київ", "start": 20, "end": 24,
         "score": 1.0},
    ]
    md = render_report_md("Олег ... Іван ... Київ", ents)
    assert "# Звіт про деідентифікацію" in md
    assert "| Показник | Значення |" in md
    # grouped by type, sorted; within type numbered by start position
    assert md.index("### LOC (1 знайдено)") < md.index(
        "### PERS (2 знайдено)")
    assert md.index("1. **'Олег'**") < md.index("2. **'Іван'**")
    assert "впевненість 95%" in md
    # empty-entities branch
    assert "✓ Персональних даних не виявлено" in render_report_md("t", [])


def test_write_reports_md_distributed(spark, sf001, tmp_path):
    from uk_ner_presidio_demo_spark.operators.detect import anonymized_turns
    from uk_ner_presidio_demo_spark.sources.sinks import write_reports_md

    det = detect_turns(read_transcripts(spark, sf001).limit(200))
    m = mentions_from_turns(det)
    a = anonymized_turns(det)
    out = str(tmp_path / "reports_md")
    write_reports_md(m, a, out)
    back = spark.read.json(out)
    assert back.count() == a.select("conv_id").distinct().count()
    one = back.filter("report_md LIKE '%### %'").first()
    assert one is not None and "## Анонімізований текст" in one["report_md"]


def test_selective_anonymize_identity_when_nothing_confirmed(spark, sf001):
    """Zero confirmed spans => selective rewrite is the identity (the
    reference's empty-result behavior, test_analyzer.py:88-102)."""
    from uk_ner_presidio_demo_spark.operators.review import selective_anonymize
    from uk_ner_presidio_demo_spark.sources.tables import valid_text_predicate

    tr = read_transcripts(spark, sf001).filter(valid_text_predicate()).limit(50)
    empty_kept = mentions_from_turns(
        detect_turns(tr, with_anonymized=False)
    ).filter("1=0")
    out = selective_anonymize(tr, empty_kept).toPandas()
    src = tr.select("conv_id", "turn_idx", "text").toPandas()
    merged = out.merge(src, on=["conv_id", "turn_idx"])
    assert (merged["anonymized_text"] == merged["text"]).all()


def test_highlight_segments_reassemble(spark, sf001):
    """Concatenating a turn's chunks in seg_idx order reproduces the text."""
    from uk_ner_presidio_demo_spark.operators.review import highlight_segments
    from uk_ner_presidio_demo_spark.sources.tables import valid_text_predicate

    tr = read_transcripts(spark, sf001).filter(valid_text_predicate()).limit(200)
    m = mentions_from_turns(detect_turns(tr, with_anonymized=False))
    segs = highlight_segments(tr, m).toPandas()
    joined = (
        segs.sort_values(["conv_id", "turn_idx", "seg_idx"])
        .groupby(["conv_id", "turn_idx"])["chunk"]
        .agg("".join)
        .reset_index()
    )
    src = tr.select("conv_id", "turn_idx", "text").toPandas()
    merged = joined.merge(src, on=["conv_id", "turn_idx"])
    assert len(merged) > 0
    assert (merged["chunk"] == merged["text"]).all()
