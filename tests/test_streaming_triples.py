"""Incremental streaming KG triples (streaming/kg_stream.py): the stateful
windowed emitter must converge to EXACTLY the batch emit_triples output
once every turn's ±W window closes, across micro-batch boundaries."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from uk_ner_presidio_demo_spark.data.synth import ensure_transcripts
from uk_ner_presidio_demo_spark.semantics.triples import WINDOW_W
from uk_ner_presidio_demo_spark.streaming.detect_stream import (
    run_available_now,
)
from uk_ner_presidio_demo_spark.streaming.kg_stream import (
    streaming_triples, write_conv_ordered_source,
)


def _ordered_batches(tmp_path, full: pd.DataFrame, span: int = 5):
    """Shared EOS-marker source builder (now in kg_stream, also used by
    the stream_triples driver board row)."""
    return write_conv_ordered_source(tmp_path / "src", full, span=span)


def test_streaming_triples_converge_to_batch(spark, sf001, tmp_path):
    src_dir = ensure_transcripts(sf001)
    full = pd.concat(
        [pd.read_parquet(p) for p in sorted(src_dir.glob("part-*.parquet"))]
    )
    src = _ordered_batches(tmp_path, full)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = run_available_now(
        streaming_triples(stream), "stream_triples",
        str(tmp_path / "ck"), "append",
    ).toPandas()

    from uk_ner_presidio_demo_spark.operators.detect import (
        detect_turns, mentions_from_turns,
    )
    from uk_ner_presidio_demo_spark.operators.triples import emit_triples
    from uk_ner_presidio_demo_spark.sources.tables import read_transcripts

    tr = read_transcripts(spark, sf001)
    batch = emit_triples(
        tr, mentions_from_turns(detect_turns(tr, with_anonymized=False))
    ).toPandas()

    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    batch_set = set(map(tuple, batch[key].itertuples(index=False)))
    assert len(got) == len(got_set)  # exactly-once emission
    assert got_set == batch_set
    # the stream really ran multiple micro-batches (state spanned batches)
    assert len(list(src.glob("part-*.parquet"))) > 3


def test_streaming_triples_ttl_flushes_tail(spark, tmp_path):
    """VERDICT r3 #6: a conversation with NO trailing quiet period (no
    EOS markers, last turns still inside the ±W window) must still
    converge to the batch output once the state TTL expires — the tail
    anchors flush on timeout instead of waiting forever."""
    import time

    conv = "conv_ttl"
    base_ts = pd.Timestamp("2024-01-01").as_unit("us")
    turn_rows = [(conv, i, "user", "текст розмови",
                  "searx" if i in (0, 5) else None, base_ts)
                 for i in range(6)]
    pdf = pd.DataFrame(
        turn_rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    ).astype({"turn_idx": "int32"})
    pdf["tool"] = pdf["tool"].astype("string")
    src = tmp_path / "src"
    src.mkdir()
    pdf[pdf["turn_idx"] < 3].to_parquet(src / "part-0.parquet", index=False)
    pdf[pdf["turn_idx"] >= 3].to_parquet(src / "part-1.parquet", index=False)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # availableNow + ProcessingTimeTimeout never self-terminates (CLAUDE.md):
    # poll the memory sink for the tail triple, then stop explicitly.
    q = (
        streaming_triples(stream, ttl_ms=1)
        .writeStream.format("memory").queryName("stream_triples_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            got = spark.table("stream_triples_ttl").toPandas()
            if ((got["pred"] == "uses_tool") & (got["turn_idx"] == 5)).any():
                break
            time.sleep(2)
    finally:
        q.stop()
    got = spark.table("stream_triples_ttl").toPandas()

    from uk_ner_presidio_demo_spark.operators.detect import (
        detect_turns, mentions_from_turns,
    )
    from uk_ner_presidio_demo_spark.operators.triples import emit_triples

    tr = spark.createDataFrame(pdf)
    batch = emit_triples(
        tr, mentions_from_turns(detect_turns(tr, with_anonymized=False))
    ).toPandas()
    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    batch_set = set(map(tuple, batch[key].itertuples(index=False)))
    assert len(got) == len(got_set)      # exactly-once even across TTL
    assert got_set == batch_set          # tail anchors flushed by TTL


def test_streaming_triples_drop_late_turns(spark, tmp_path):
    """A turn re-arriving AFTER its window finalized must be dropped, not
    double-emitted (processing-time watermark-discard semantics)."""
    conv = "conv_late"
    base_ts = pd.Timestamp("2024-01-01").as_unit("us")

    def rows(idx_tool_text):
        return pd.DataFrame(
            [(conv, i, "user", txt, tool, base_ts)
             for i, tool, txt in idx_tool_text],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ).astype({"turn_idx": "int32"})

    src = tmp_path / "src"
    src.mkdir()
    # batch 0: turns 0..4 (turn 0 uses a tool -> emits uses_tool@0)
    rows([(0, "searx", "привіт"), (1, None, "текст"),
          (2, None, "текст"), (3, None, "текст"),
          (4, None, "текст")]).to_parquet(src / "part-0.parquet",
                                          index=False)
    # batch 1: turn 0 RE-ARRIVES (already finalized: 0 <= 4-2) + turns 5..6
    rows([(0, "searx", "привіт"), (5, None, "текст"),
          (6, None, "текст")]).to_parquet(src / "part-1.parquet",
                                          index=False)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = run_available_now(
        streaming_triples(stream), "stream_triples_late",
        str(tmp_path / "ck"), "append",
    ).toPandas()

    uses = got[(got["pred"] == "uses_tool") & (got["turn_idx"] == 0)]
    assert len(uses) == 1  # emitted exactly once despite the late replay
