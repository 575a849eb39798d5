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
from uk_ner_presidio_demo_spark.streaming.kg_stream import streaming_triples


def _ordered_batches(tmp_path, full: pd.DataFrame, span: int = 5):
    """Split rows into files by turn_idx range so per-conv arrival stays
    monotonic across micro-batches, then append W inert end-of-conv marker
    turns per conv (empty text, no tool) to close every window."""
    src = tmp_path / "src"
    src.mkdir()
    # pin dtypes: an all-None object slice would write a null-typed parquet
    # column (read back as INT32) and break the stream's string schema
    full = full.copy()
    full["tool"] = full["tool"].astype("string")
    full["text"] = full["text"].astype("string")
    n_files = int(full["turn_idx"].max()) // span + 1
    for k in range(n_files):
        sub = full[(full["turn_idx"] >= k * span)
                   & (full["turn_idx"] < (k + 1) * span)]
        if len(sub):
            sub.to_parquet(src / f"part-{k:03d}.parquet", index=False)
    eos_rows = []
    for conv_id, grp in full.groupby("conv_id"):
        last = int(grp["turn_idx"].max())
        for w in range(1, WINDOW_W + 1):
            eos_rows.append(
                (conv_id, last + w, "system", "", None,
                 grp["ts"].iloc[0])
            )
    eos = pd.DataFrame(
        eos_rows, columns=["conv_id", "turn_idx", "role", "text", "tool",
                           "ts"],
    ).astype({"turn_idx": "int32"})
    # the streaming parquet reader rejects nano timestamps (CLAUDE.md),
    # and an all-None object column writes as INT32 — pin both dtypes
    eos["ts"] = eos["ts"].astype("datetime64[us]")
    eos["tool"] = eos["tool"].astype("string")
    eos.to_parquet(src / f"part-{n_files:03d}-eos.parquet", index=False)
    return src


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
