"""Span sanitization (O-7) and greedy conflict resolution (W-1/W-2).

Semantics mirrored from the reference (re-stated, not ported):
  - sanitize: clamp start to >=0, end to <=len(text), drop start>=end
    (/root/reference/core/analyzer.py:220-267)
  - "score" strategy: sort by (-score, start, end), greedily keep spans that
    do not overlap any already-accepted span, then re-sort by start
    (/root/reference/utils/conflict_resolution.py:20-59)
  - "priority" strategy: same greedy, ordered by
    (priority(entity_type), -score, start, end)
    (/root/reference/utils/conflict_resolution.py:62-125)

The greedy accepted-set check is inherently sequential per text, which is why
this lives in a shared pure-Python kernel invoked per turn inside the Arrow
batch UDF (SURVEY.md §2.5 W-1) rather than as a SQL window approximation.

Span tuples are (entity_type:str, start:int, end:int, score:float).
"""

from __future__ import annotations

from .registry import priority_of

Span = tuple[str, int, int, float]


def sanitize_spans(text_len: int, spans: list[Span]) -> list[Span]:
    out: list[Span] = []
    for etype, start, end, score in spans:
        s = max(0, start)
        e = min(text_len, end)
        if s >= e:
            continue
        out.append((etype, s, e, score))
    return out


def _greedy(spans: list[Span], key) -> list[Span]:
    accepted: list[Span] = []
    for cand in sorted(spans, key=key):
        _, cs, ce, _ = cand
        overlaps = any(not (ce <= s or cs >= e) for _, s, e, _ in accepted)
        if not overlaps:
            accepted.append(cand)
    return sorted(accepted, key=lambda sp: sp[1])


def resolve_conflicts(spans: list[Span], strategy: str = "score") -> list[Span]:
    if not spans:
        return []
    if strategy == "score":
        return _greedy(spans, key=lambda sp: (-sp[3], sp[1], sp[2]))
    if strategy == "priority":
        return _greedy(
            spans, key=lambda sp: (priority_of(sp[0]), -sp[3], sp[1], sp[2])
        )
    raise ValueError(
        f"Unknown strategy '{strategy}'. Available: ['score', 'priority']"
    )
