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


def test_streaming_triples_resume_after_ttl_no_duplicates(spark, tmp_path):
    """ADVICE r4 tripwire: a conversation RESUMING after a TTL flush must
    not re-emit already-final anchors.  The TTL flush now leaves a
    TOMBSTONE state carrying the 'final' watermark (timeout re-armed)
    instead of remove(), so re-delivered turns <= final are late-dropped
    exactly like the in-flight case; only a second full quiet TTL drops
    the tombstone (the documented residual window).  ttl_ms here is 8 s
    so the resume file (written right after the flush is observed and
    picked up by the 1 s trigger) provably lands INSIDE the tombstone
    window; the 1 ms TTL of the flush test would tombstone-expire before
    any file write could race it.

    Deliberately runs under a CONTINUOUS ProcessingTime trigger, not
    availableNow (which snapshots the file listing at query start and
    would never see the resume file) — doubling as the VERDICT r4 #8
    evidence that the stateful operator doesn't depend on availableNow
    batching."""
    import time

    conv = "conv_resume"
    base_ts = pd.Timestamp("2024-01-01").as_unit("us")

    def mk(turns, tools=()):
        pdf = pd.DataFrame(
            [(conv, i, "user", "текст розмови",
              "searx" if i in tools else None, base_ts) for i in turns],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ).astype({"turn_idx": "int32"})
        pdf["tool"] = pdf["tool"].astype("string")
        return pdf

    src = tmp_path / "src"
    src.mkdir()
    mk(range(6), tools=(0, 5)).to_parquet(src / "part-0.parquet",
                                          index=False)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_triples(stream, ttl_ms=8000)
        .writeStream.format("memory").queryName("stream_triples_resume")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )

    def wait_for(pred_turn, deadline_s=120):
        deadline = time.time() + deadline_s
        while time.time() < deadline:
            got = spark.table("stream_triples_resume").toPandas()
            if ((got["pred"] == "uses_tool")
                    & (got["turn_idx"] == pred_turn)).any():
                return got
            time.sleep(2)
        raise AssertionError(f"uses_tool@{pred_turn} never arrived")

    try:
        wait_for(5)  # TTL flushed every anchor incl. the tail turn 5
        # resume: re-deliver turns 0..5 (all <= final -> must late-drop)
        # plus a NEW tool turn 9 whose triple signals processing finished
        mk(list(range(6)) + [9], tools=(0, 5, 9)).to_parquet(
            src / "part-1-resume.parquet", index=False
        )
        got = wait_for(9)
    finally:
        q.stop()

    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    rows = list(map(tuple, got[key].itertuples(index=False)))
    assert len(rows) == len(set(rows)), (
        "post-TTL resume re-emitted already-final anchors"
    )
    # the re-delivered tool turns 0 and 5 appear exactly once each
    ut = got[got["pred"] == "uses_tool"]["turn_idx"].tolist()
    assert sorted(ut) == [0, 5, 9]


class _FakeGroupState:
    """Minimal GroupState stand-in for direct state-fn calls."""

    def __init__(self, blob=None, timed_out=False):
        self._blob = blob
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._blob is not None

    @property
    def get(self):
        return (self._blob,)

    def update(self, tup):
        self._blob = tup[0]

    def remove(self):
        self._blob = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


class TestTombstoneTransitions:
    """Deterministic unit coverage of the TTL tombstone state machine
    (ADVICE r4) — engine timing can't race direct calls."""

    @staticmethod
    def _pdf(turns, tools=()):
        return pd.DataFrame(
            [("c", t, "текст розмови", "searx" if t in tools else None)
             for t in turns],
            columns=["conv_id", "turn_idx", "text", "tool"],
        )

    def _run(self, fn, state, pdfs):
        import json

        out = list(fn(("c",), iter(pdfs), state))
        blob = None if state._blob is None else json.loads(state._blob)
        return out, blob

    def test_ttl_flush_leaves_tombstone_with_final(self):
        from uk_ner_presidio_demo_spark.streaming.kg_stream import (
            make_triples_state_fn,
        )

        fn = make_triples_state_fn(ttl_ms=1000)
        st = _FakeGroupState()
        # data batch: turns 0..5, tool at 0 and 5 (tail inside the window)
        out, blob = self._run(fn, st, [self._pdf(range(6), tools=(0, 5))])
        assert blob["final"] < 5  # tail not yet final, buffered
        st.hasTimedOut = True
        out, blob = self._run(fn, st, [])
        flushed = pd.concat(out)
        assert 5 in set(flushed["turn_idx"])        # tail anchor flushed
        assert blob is not None and blob["flushed"] # tombstone, not remove
        assert blob["final"] == 5 and blob["buf"] == []
        assert st.timeout_set == 1000               # timeout re-armed

    def test_resume_within_tombstone_late_drops(self):
        from uk_ner_presidio_demo_spark.streaming.kg_stream import (
            make_triples_state_fn,
        )

        fn = make_triples_state_fn(ttl_ms=1000)
        st = _FakeGroupState()
        self._run(fn, st, [self._pdf(range(6), tools=(0, 5))])
        st.hasTimedOut = True
        self._run(fn, st, [])
        st.hasTimedOut = False
        # re-deliver the already-final turns: nothing may re-emit
        out, blob = self._run(fn, st, [self._pdf(range(6), tools=(0, 5))])
        assert not out
        assert blob["late"] == 6          # observable watermark discards
        assert blob["final"] == 5

    def test_second_quiet_ttl_removes_tombstone(self):
        from uk_ner_presidio_demo_spark.streaming.kg_stream import (
            make_triples_state_fn,
        )

        fn = make_triples_state_fn(ttl_ms=1000)
        st = _FakeGroupState()
        self._run(fn, st, [self._pdf(range(6), tools=(0, 5))])
        st.hasTimedOut = True
        self._run(fn, st, [])             # flush -> tombstone
        out, blob = self._run(fn, st, []) # second quiet TTL -> removed
        assert not out and st.removed and blob is None

    def test_new_turns_reactivate_tombstone(self):
        from uk_ner_presidio_demo_spark.streaming.kg_stream import (
            make_triples_state_fn,
        )

        fn = make_triples_state_fn(ttl_ms=1000)
        st = _FakeGroupState()
        self._run(fn, st, [self._pdf(range(6), tools=(0, 5))])
        st.hasTimedOut = True
        self._run(fn, st, [])
        st.hasTimedOut = False
        out, blob = self._run(fn, st, [self._pdf([9], tools=(9,))])
        assert blob["flushed"] is False   # conv resumed; tombstone re-arms
        st.hasTimedOut = True
        out, blob = self._run(fn, st, [])
        flushed = pd.concat(out)
        assert set(flushed["turn_idx"]) == {9}  # only the NEW anchor


def test_streaming_triples_restart_from_checkpoint(spark, sf001, tmp_path):
    """Checkpoint RECOVERY (VERDICT r5 #6 — the standard Structured
    Streaming failure mode): a query writing to a durable parquet sink
    is stopped mid-run after a few micro-batches, a NEW query restarts
    on the SAME checkpoint + sink, runs the remaining input to
    completion, and the sink equals the batch golden with no duplicates
    — offsets, operator state (the ±W window buffers), and the sink
    commit log all survive the restart."""
    import time

    src_dir = ensure_transcripts(sf001)
    full = pd.concat(
        [pd.read_parquet(p) for p in sorted(src_dir.glob("part-*.parquet"))]
    )
    src = _ordered_batches(tmp_path, full)
    n_files = len(list(src.glob("part-*.parquet")))
    assert n_files > 6  # enough micro-batches that a mid-run stop is real

    def reader():
        return (
            spark.readStream.schema(
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")

    # run 1: stop after >=2 committed micro-batches (mid-run)
    q1 = (
        streaming_triples(reader())
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            done = [p for p in q1.recentProgress
                    if p["numInputRows"] > 0]
            if len(done) >= 2:
                break
            time.sleep(0.3)
    finally:
        q1.stop()
    q1.awaitTermination()
    batches_run1 = len([p for p in q1.recentProgress
                        if p["numInputRows"] > 0])

    # run 2: NEW query object, same checkpoint + sink, to completion
    q2 = (
        streaming_triples(reader())
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = spark.read.parquet(sink).toPandas()

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
    got_rows = list(map(tuple, got[key].itertuples(index=False)))
    batch_set = set(map(tuple, batch[key].itertuples(index=False)))
    assert len(got_rows) == len(set(got_rows)), (
        "restart duplicated rows across the checkpoint boundary"
    )
    assert set(got_rows) == batch_set
    # the restart genuinely continued (run 1 did not consume everything)
    assert batches_run1 < n_files
