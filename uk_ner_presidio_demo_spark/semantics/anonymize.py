"""Anonymization splice (F-1) — positional span replacement.

Replaces each resolved span with "[{entity_type}]", right-to-left so earlier
offsets stay valid; zero spans => identity (the reference delegates this to
Presidio's AnonymizerEngine with per-type "replace" operators —
/root/reference/core/analyzer.py:269-314; golden behavior
/root/reference/test/test_analyzer.py:128-143).  Positional, not
pattern-positional, so it cannot be expressed as regexp_replace — it runs as
a vectorized pandas UDF in the engine and as this same function in the oracle.
"""

from __future__ import annotations

from .registry import replacement_for


def splice(text: str, spans: list[tuple[str, int, int]]) -> str:
    """spans: (entity_type, start, end), assumed non-overlapping."""
    if not spans:
        return text
    out = text
    for etype, start, end in sorted(spans, key=lambda sp: sp[1], reverse=True):
        out = out[:start] + replacement_for(etype) + out[end:]
    return out
