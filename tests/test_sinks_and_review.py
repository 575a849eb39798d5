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
