"""Relation/triple semantics (SURVEY.md §2.10) — frozen spec [north-rule].

The predicate vocabulary comes from BASELINE.json (mentions_person, uses_tool,
contacts_via, shares_pii_with); the mention semantics the predicates consume
come from the reference recognizers.  Window size, tie-breaks, PII set, and
entity-reference encoding are constants HERE so the plain-Python oracle and
the Spark cogrouped-applyInPandas emitter share them literally.

Entity references (pre-canonicalization) are "TYPE:norm_surface"; the
canonicalization stage later rewrites them to stable canonical ids.

Emission rules per conversation (turns sorted by turn_idx):
  mentions_person   (conv:<id>, mentions_person, PERS:<norm>) for each
                    distinct PERS norm-surface in the turn.
  uses_tool         (conv:<id>, uses_tool, tool:<tool>) when the row has a
                    non-null non-empty tool.
  contacts_via      for each channel mention (EMAIL_ADDRESS/PHONE_NUMBER/URL)
                    in turn t: nearest PERS/ORG mention within |dt| <= W;
                    tie-break (same turn first, then smaller |dt|, then
                    smaller turn_idx, then smaller start) ->
                    (party_ref, contacts_via, channel_ref) anchored at t.
  shares_pii_with   when a high-priority PII span occurs in turn t: for each
                    PERS entity p mentioned IN t, for each distinct PERS/ORG
                    entity q != p mentioned within |dt| <= W:
                    (PERS:<p>, shares_pii_with, <q_ref>) anchored at t.

All outputs are deduped per (turn_idx, subj, pred, obj).
"""

from __future__ import annotations

from .detect import Mention

WINDOW_W: int = 2

CHANNEL_TYPES: frozenset[str] = frozenset({"EMAIL_ADDRESS", "PHONE_NUMBER", "URL"})
PARTY_TYPES: frozenset[str] = frozenset({"PERS", "ORG"})
# High-priority PII per the reference priority map (priority <= 2 families
# plus DOC; excludes PERS itself) — utils/conflict_resolution.py:71-91.
PII_TYPES: frozenset[str] = frozenset(
    {"CREDIT_CARD", "IBAN_CODE", "EMAIL_ADDRESS", "PHONE_NUMBER", "CRYPTO", "DOC"}
)

PRED_MENTIONS_PERSON = "mentions_person"
PRED_USES_TOOL = "uses_tool"
PRED_CONTACTS_VIA = "contacts_via"
PRED_SHARES_PII_WITH = "shares_pii_with"


def entity_ref(entity_type: str, normed: str) -> str:
    return f"{entity_type}:{normed}"


def conv_ref(conv_id: str) -> str:
    return f"conv:{conv_id}"


def tool_ref(tool: str) -> str:
    return f"tool:{tool}"


Triple = tuple[int, str, str, str]  # (turn_idx, subj, pred, obj)


def emit_triples_for_conv(
    conv_id: str,
    turns: list[tuple[int, str | None]],          # (turn_idx, tool)
    mentions: dict[int, list[Mention]],           # turn_idx -> resolved mentions
    window: int = WINDOW_W,
) -> list[Triple]:
    out: set[Triple] = set()
    subj_conv = conv_ref(conv_id)
    turn_idxs = sorted(t for t, _ in turns)

    # Flat (turn_idx, mention) list for window scans, in deterministic order.
    flat: list[tuple[int, Mention]] = []
    for t in turn_idxs:
        for m in mentions.get(t, []):
            flat.append((t, m))

    for t, tool in sorted(turns):
        ms = mentions.get(t, [])

        # mentions_person
        for m in ms:
            if m.entity_type == "PERS":
                out.add((t, subj_conv, PRED_MENTIONS_PERSON,
                         entity_ref("PERS", m.norm_surface)))

        # uses_tool
        if tool is not None and tool != "":
            out.add((t, subj_conv, PRED_USES_TOOL, tool_ref(tool)))

        # contacts_via: channel mention in t -> nearest party in window
        for m in ms:
            if m.entity_type not in CHANNEL_TYPES:
                continue
            best = None
            best_key = None
            for pt, pm in flat:
                if pm.entity_type not in PARTY_TYPES:
                    continue
                dt = abs(pt - t)
                if dt > window:
                    continue
                key = (0 if pt == t else 1, dt, pt, pm.start)
                if best_key is None or key < best_key:
                    best_key = key
                    best = (pm.entity_type, pm.norm_surface)
            if best is not None:
                out.add((t, entity_ref(*best), PRED_CONTACTS_VIA,
                         entity_ref(m.entity_type, m.norm_surface)))

        # shares_pii_with
        if any(m.entity_type in PII_TYPES for m in ms):
            persons_in_t = sorted(
                {m.norm_surface for m in ms if m.entity_type == "PERS"}
            )
            if persons_in_t:
                parties_in_window = {
                    (pm.entity_type, pm.norm_surface)
                    for pt, pm in flat
                    if pm.entity_type in PARTY_TYPES and abs(pt - t) <= window
                }
                for p in persons_in_t:
                    for qt, qn in parties_in_window:
                        if qt == "PERS" and qn == p:
                            continue
                        out.add((t, entity_ref("PERS", p),
                                 PRED_SHARES_PII_WITH, entity_ref(qt, qn)))

    return sorted(out)
