"""Plain-Python reference oracle — the single-process restatement of the
reference pipeline (validate -> NER -> patterns -> union -> sanitize ->
conflict-resolve -> anonymize; /root/reference/core/analyzer.py:91-197),
extended with the [north-rule] KG stages (triples, linking, canonicalization)
over the same frozen semantics modules the Spark engine uses.

The driver's DuckDB correctness gate reads this oracle's materialized golden
parquet; pytest additionally full-outer-joins engine vs oracle outputs
(SURVEY.md §5.2 item 1, J-5).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pandas as pd

from ..semantics.anonymize import splice
from ..semantics.detect import Mention, detect_mentions
from ..semantics.minhash import JACCARD_THRESHOLD, band_keys, jaccard, minhash_signature
from ..semantics.registry import is_valid_text
from ..semantics.triples import WINDOW_W, emit_triples_for_conv
from ..data.synth import (
    DATA_ROOT, ensure_aliases, ensure_transcripts, sf_key_for_dir,
)

DEFAULT_STRATEGY = "priority"  # the reference UI's choice (gradio_interface.py:171)


def analyze_turn(text: str, strategy: str = DEFAULT_STRATEGY
                 ) -> tuple[list[Mention], str]:
    mentions, _ = detect_mentions(text, strategy=strategy)
    anonymized = splice(text, [(m.entity_type, m.start, m.end) for m in mentions])
    return mentions, anonymized


def run_oracle(transcripts: pd.DataFrame, strategy: str = DEFAULT_STRATEGY
               ) -> dict[str, pd.DataFrame]:
    """Full oracle over a transcripts frame -> golden tables."""
    mention_rows, anon_rows, triple_rows = [], [], []

    by_conv: dict[str, list] = {}
    for row in transcripts.itertuples(index=False):
        by_conv.setdefault(row.conv_id, []).append(row)

    for conv_id in sorted(by_conv):
        turns_meta: list[tuple[int, str | None]] = []
        mentions_by_turn: dict[int, list[Mention]] = {}
        for row in sorted(by_conv[conv_id], key=lambda r: r.turn_idx):
            tool = None if (row.tool is None or (isinstance(row.tool, float))) \
                else row.tool
            turns_meta.append((int(row.turn_idx), tool))
            if not is_valid_text(row.text):
                continue
            mentions, anonymized = analyze_turn(row.text, strategy)
            mentions_by_turn[int(row.turn_idx)] = mentions
            for m in mentions:
                mention_rows.append(
                    (conv_id, int(row.turn_idx), m.mention_idx, m.entity_type,
                     m.start, m.end, m.score, m.surface, m.norm_surface)
                )
            anon_rows.append((conv_id, int(row.turn_idx), anonymized))
        for t, subj, pred, obj in emit_triples_for_conv(
            conv_id, turns_meta, mentions_by_turn, WINDOW_W
        ):
            triple_rows.append((conv_id, t, subj, pred, obj))

    golden_mentions = pd.DataFrame(
        mention_rows,
        columns=["conv_id", "turn_idx", "mention_idx", "entity_type",
                 "start", "end", "score", "surface", "norm_surface"],
    )
    golden_anonymized = pd.DataFrame(
        anon_rows, columns=["conv_id", "turn_idx", "anonymized_text"]
    )
    golden_triples = pd.DataFrame(
        triple_rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
    )
    # two-phase review goldens: confirmed subset -> selective splice;
    # highlight segmentation over the full resolved set
    from ..semantics.review import is_confirmed

    sel_rows, seg_rows = [], []
    turn_text = {
        (r.conv_id, int(r.turn_idx)): r.text
        for r in transcripts.itertuples(index=False)
        if is_valid_text(r.text)
    }
    by_turn_mentions: dict[tuple[str, int], list] = {}
    for row in mention_rows:
        by_turn_mentions.setdefault((row[0], row[1]), []).append(row)
    for key, text in sorted(turn_text.items()):
        ms = by_turn_mentions.get(key, [])
        kept = [(m[3], m[4], m[5]) for m in ms if is_confirmed(m[3], m[6])]
        sel_rows.append((key[0], key[1], splice(text, kept)))
        if ms:
            pos, seg = 0, 0
            for etype, start, end in [(m[3], m[4], m[5]) for m in ms]:
                if start > pos:
                    seg_rows.append((key[0], key[1], seg, text[pos:start], None))
                    seg += 1
                seg_rows.append((key[0], key[1], seg, text[start:end], etype))
                seg += 1
                pos = end
            if pos < len(text):
                seg_rows.append((key[0], key[1], seg, text[pos:], None))

    golden_selective = pd.DataFrame(
        sel_rows, columns=["conv_id", "turn_idx", "anonymized_text"]
    )
    golden_segments = pd.DataFrame(
        seg_rows, columns=["conv_id", "turn_idx", "seg_idx", "chunk", "label"]
    )
    golden_selective["turn_idx"] = golden_selective["turn_idx"].astype("int64")
    golden_segments[["turn_idx", "seg_idx"]] = \
        golden_segments[["turn_idx", "seg_idx"]].astype("int64")

    golden_nodes = canonicalize(golden_mentions)
    ref_map = {
        f"{r.entity_type}:{r.norm_surface}": r.canonical_id
        for r in golden_nodes.itertuples(index=False)
    }
    golden_canonical_triples = golden_triples.copy()
    for col in ("subj", "obj"):
        golden_canonical_triples[col] = golden_canonical_triples[col].map(
            lambda v: ref_map.get(v, v)
        )
    golden_canonical_triples = golden_canonical_triples.drop_duplicates(
    ).reset_index(drop=True)
    for df in (golden_mentions, golden_triples):
        for c in df.columns:
            if df[c].dtype == "int32":
                df[c] = df[c].astype("int64")
    golden_mentions[["turn_idx", "mention_idx", "start", "end"]] = \
        golden_mentions[["turn_idx", "mention_idx", "start", "end"]].astype("int64")
    golden_anonymized["turn_idx"] = golden_anonymized["turn_idx"].astype("int64")
    golden_triples["turn_idx"] = golden_triples["turn_idx"].astype("int64")
    return {
        "golden_mentions": golden_mentions,
        "golden_anonymized": golden_anonymized,
        "golden_triples": golden_triples,
        "golden_nodes": golden_nodes,
        "golden_canonical_triples": golden_canonical_triples,
        "golden_selective_anonymized": golden_selective,
        "golden_segments": golden_segments,
    }


def canonical_id(entity_type: str, canonical_norm: str) -> str:
    """Stable canonical id (F-9): sha256 hex of 'type:canonical_norm' —
    matches Spark's F.sha2(concat_ws(':', ...), 256)."""
    return hashlib.sha256(
        f"{entity_type}:{canonical_norm}".encode("utf-8")
    ).hexdigest()


def canonicalize(mentions: pd.DataFrame) -> pd.DataFrame:
    """Entity linking + connected-components canonicalization (J-1/J-2/J-3),
    single-process: alias-dict edges + MinHash-LSH candidate edges with exact
    Jaccard verify, then union-find; canonical surface = lexicographic min of
    the component; ids via `canonical_id`."""
    aliases = pd.read_parquet(ensure_aliases())
    alias_map: dict[tuple[str, str], str] = {
        (r.entity_type, r.alias_norm): r.canonical_norm
        for r in aliases.itertuples(index=False)
    }

    # Frozen node rule: mention entities, plus the canonical targets of
    # aliases that were actually mentioned (the Spark twin derives the same
    # set from the broadcast alias join's matched rows).
    ment_ents = set(zip(mentions["entity_type"], mentions["norm_surface"]))
    extra = {
        (t, alias_map[(t, n)]) for (t, n) in ment_ents if (t, n) in alias_map
    }
    ents = sorted(ment_ents | extra)
    parent = {e: e for e in ents}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic root choice: lexicographic min
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo

    # alias edges (only for aliases that were actually mentioned)
    for (etype, an) in sorted(ment_ents):
        cn = alias_map.get((etype, an))
        if cn is not None:
            union((etype, an), (etype, cn))

    # LSH candidate edges (same entity_type only), verified by exact Jaccard
    buckets: dict[tuple[str, int, int], list[tuple[str, str]]] = {}
    for e in ents:
        etype, ns = e
        for b, h in band_keys(minhash_signature(ns)):
            buckets.setdefault((etype, b, h), []).append(e)
    for members in buckets.values():
        if len(members) < 2:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if jaccard(members[i][1], members[j][1]) >= JACCARD_THRESHOLD:
                    union(members[i], members[j])

    comp: dict[tuple[str, str], list[str]] = {}
    for e in ents:
        comp.setdefault(find(e), []).append(e[1])
    rows = []
    for root, surfaces in comp.items():
        etype = root[0]
        canon = min(surfaces)
        cid = canonical_id(etype, canon)
        for s in sorted(surfaces):
            rows.append((etype, s, canon, cid))
    return pd.DataFrame(
        rows, columns=["entity_type", "norm_surface", "canonical_norm",
                       "canonical_id"]
    ).sort_values(["entity_type", "norm_surface"]).reset_index(drop=True)


GOLDEN_VERSION = 6  # bump when oracle semantics/outputs change -> cache bust


def ensure_golden(sf_dir: str, strategy: str = DEFAULT_STRATEGY) -> Path:
    """Materialize golden parquet for the sf of `sf_dir` (cached)."""
    key = sf_key_for_dir(sf_dir)
    out_dir = DATA_ROOT / key if strategy == DEFAULT_STRATEGY \
        else DATA_ROOT / f"{key}_{strategy}"
    marker = out_dir / f"_GOLDEN_{strategy}_v{GOLDEN_VERSION}_OK"
    if marker.exists():
        return out_dir
    tpath = ensure_transcripts(sf_dir)
    golden = run_oracle(pd.read_parquet(tpath), strategy)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, df in golden.items():
        df.to_parquet(out_dir / f"{name}.parquet", index=False)
    marker.write_text("ok")
    return out_dir
