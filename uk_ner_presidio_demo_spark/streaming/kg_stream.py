"""Incremental KG construction over a transcript STREAM (§2.8 extension;
north-rule axes A+B): stateful per-conversation triple emission whose
output converges to the batch `operators.triples.emit_triples` exactly.

Why stateful: the relation heuristic is a ±W turn window
(semantics/triples.py), so a triple anchored at turn t can depend on turns
up to t+W — turn t only FINALIZES once the conversation's clock (max
turn_idx seen) reaches t+W.  The operator therefore keeps, per conv_id, a
GroupState buffer of the un-finalized turn tail (turn metadata + detected
mentions), and on every micro-batch:

  1. runs the frozen detection kernel on the batch's new turns (same
     `detect_mentions_batch` the batch path uses — one Python stage total),
  2. appends them to the buffer,
  3. finalizes every anchor t <= max_seen - W by running the shared
     `emit_triples_for_conv` semantics over the buffered window and
     emitting exactly the triples anchored at newly-final turns,
  4. prunes the buffer to the context still needed (>= next_final - W)
     and stores it back as the new state.

Emission is therefore append-only, per-(turn, subj, pred, obj) exactly
once, and — for in-order per-conv arrival — a prefix-stable subset of the
batch output that becomes EQUAL to it once every turn's window closes
(tests feed a trailing quiet period per conv; production closes windows
with an end-of-conversation marker or a state TTL).

Ordering assumption: per-conv turn_idx arrives monotonically across
micro-batches (the transcript source is append-ordered per conversation).
A turn arriving AFTER its window was finalized is counted and dropped
(`late_dropped` — the processing-time analogue of a watermark discard),
never silently double-emitted.

State is a JSON blob (one string column): applyInPandasWithState state
structs are fixed-schema, and the buffer is a small variable-length tail
(<= 2W+batch turns/conv), so a compact JSON string is the scale-correct
encoding — state size is bounded by the window, not the conversation.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..semantics.detect import Mention, detect_mentions_batch
from ..semantics.registry import is_valid_text
from ..semantics.triples import WINDOW_W, emit_triples_for_conv

STREAM_TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
    ]
)

_KG_STATE = T.StructType([T.StructField("blob", T.StringType())])


def _detect_rows(texts: list[str], strategy: str) -> list[list[list]]:
    """Compact [(etype, norm, start), ...] per text — only the fields the
    triple rules consume (entity_type for routing/PII, norm_surface for
    refs, start for the contacts_via tie-break)."""
    out = []
    for mentions, _ in detect_mentions_batch(texts, strategy=strategy):
        out.append(
            [[m.entity_type, m.norm_surface, int(m.start)] for m in mentions]
        )
    return out


def streaming_triples(transcripts_stream: DataFrame,
                      window: int = WINDOW_W,
                      strategy: str = "priority") -> DataFrame:
    """transcripts stream (conv_id, turn_idx, role, text, tool, ts) ->
    append-only (conv_id, turn_idx, subj, pred, obj) triples, finalized
    per turn as soon as the conversation advances `window` turns past it."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        conv_id = key[0]
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"final": -1, "buf": []}  # final = last finalized anchor

        # buf: [[turn_idx, tool, [[etype, norm, start], ...]], ...] sorted
        buf = {int(t): (tool, ments) for t, tool, ments in st["buf"]}
        late_dropped = 0

        for pdf in pdfs:
            texts, metas = [], []
            for row in pdf.itertuples(index=False):
                t = int(row.turn_idx)
                if t <= st["final"]:
                    late_dropped += 1  # window already closed: drop, count
                    continue
                tool = None if (row.tool is None or row.tool != row.tool) \
                    else row.tool
                if is_valid_text(row.text):
                    texts.append(row.text)
                    metas.append((t, tool, True))
                else:
                    metas.append((t, tool, False))
            detected = iter(_detect_rows(texts, strategy))
            for t, tool, has_text in metas:
                ments = next(detected) if has_text else []
                buf[t] = (tool, ments)

        rows: list[tuple] = []
        if buf:
            max_seen = max(buf)
            finalize_to = max_seen - window
            new_final = [t for t in buf if st["final"] < t <= finalize_to]
            if new_final:
                turns = sorted((t, tool) for t, (tool, _) in buf.items())
                by_turn = {
                    t: [
                        Mention(i, et, s, s, 0.0, nm, nm)
                        for i, (et, nm, s) in enumerate(ments)
                    ]
                    for t, (_, ments) in buf.items()
                }
                triples = emit_triples_for_conv(
                    conv_id, turns, by_turn, window
                )
                anchor_set = set(new_final)
                rows = [
                    (conv_id, t, s, p, o)
                    for (t, s, p, o) in triples
                    if t in anchor_set
                ]
                st["final"] = max(new_final)
                # prune: keep context still reachable by pending anchors
                keep_from = st["final"] + 1 - window
                buf = {t: v for t, v in buf.items() if t >= keep_from}

        st["buf"] = [[t, tool, ments]
                     for t, (tool, ments) in sorted(buf.items())]
        state.update((json.dumps(st),))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "subj", "pred", "obj"],
            )

    return (
        transcripts_stream.select("conv_id", "turn_idx", "text", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=STREAM_TRIPLES_SCHEMA,
            stateStructType=_KG_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
