"""Pinned pattern-recognizer table (F-3) — OUR frozen spec.

The reference delegates 8 pattern entity types to Presidio built-ins plus one
custom Ukrainian IBAN recognizer (regex ``\\bUA\\d{27}\\b`` score 0.9 with
UA/EN context words — /root/reference/recognizers/presidio_patterns.py:118-148).
Presidio itself is NOT a dependency of this engine: the table below is an
explicit, self-contained re-specification frozen in code so reference-parity
is testable without Presidio installed (SURVEY.md §2.7 F-3).  The plain-Python
oracle imports THIS table, so engine/oracle parity is exact by construction.

Context-boost rule (frozen): if any context word occurs case-insensitively in
the CONTEXT_WINDOW chars before the match start, the score is raised by
CONTEXT_BOOST, capped at 1.0 (Presidio's LemmaContextAwareEnhancer uses the
same +0.35 boost constant publicly).
"""

from __future__ import annotations

import re
from typing import NamedTuple


class PatternSpec(NamedTuple):
    entity_type: str
    pattern: "re.Pattern[str]"
    score: float
    context: tuple[str, ...]  # context words that boost the score


CONTEXT_BOOST: float = 0.35
CONTEXT_WINDOW: int = 60  # chars before match start scanned for context words

# Context words for the Ukrainian IBAN recognizer — values from
# /root/reference/recognizers/presidio_patterns.py:134-143.
_IBAN_CONTEXT = (
    "рахунок", "рахунку", "рахунка",
    "iban",
    "оплата", "оплати",
    "банк", "банку", "банківський",
    "переказ", "перевод",
    "account", "payment", "transfer",
)

PATTERN_SPECS: tuple[PatternSpec, ...] = (
    PatternSpec(
        "IBAN_CODE",
        re.compile(r"\bUA\d{27}\b"),
        0.9,
        _IBAN_CONTEXT,
    ),
    PatternSpec(
        "EMAIL_ADDRESS",
        re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"),
        0.85,
        (),
    ),
    PatternSpec(
        "PHONE_NUMBER",
        # Ukrainian mobile (+380XXXXXXXXX / 380XXXXXXXXX / 0XXXXXXXXX) or a
        # generic international +NNNNNNN..NNNNNNNNNNNNNNN form.
        re.compile(r"(?<![\d+])(?:\+?380\d{9}|0\d{9}|\+\d{7,15})(?!\d)"),
        0.7,
        (),
    ),
    PatternSpec(
        "CREDIT_CARD",
        # 16 digits, optionally space/dash-grouped in fours.
        re.compile(r"(?<!\d)(?:\d{4}[ -]?){3}\d{4}(?!\d)"),
        0.8,
        (),
    ),
    PatternSpec(
        "IP_ADDRESS",
        re.compile(r"(?<![\d.])(?:\d{1,3}\.){3}\d{1,3}(?![\d.])"),
        0.6,
        (),
    ),
    PatternSpec(
        "URL",
        re.compile(r"\bhttps?://[^\s\"'<>)]+|\bwww\.[^\s\"'<>)]+"),
        0.6,
        (),
    ),
    PatternSpec(
        "CRYPTO",
        # Bitcoin-style base58 address.
        re.compile(r"\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\b"),
        0.4,
        (),
    ),
    PatternSpec(
        "DATE_TIME",
        # dd.mm.yyyy[ hh:mm] | standalone hh:mm
        re.compile(
            r"\b\d{1,2}[./-]\d{1,2}[./-]\d{2,4}(?:\s+\d{1,2}:\d{2})?\b"
            r"|\b\d{1,2}:\d{2}\b"
        ),
        0.6,
        (),
    ),
)


def find_pattern_spans(
    text: str, enabled: frozenset[str] | None = None
) -> list[tuple[str, int, int, float]]:
    """All pattern matches as (entity_type, start, end, score) raw spans.

    Mirrors the reference's pattern stage (core/analyzer.py:156-170) with the
    frozen table above.  Overlaps between specs are allowed here; conflict
    resolution (resolution.py) removes them later, exactly as in the
    reference pipeline order.
    """
    out: list[tuple[str, int, int, float]] = []
    lowered = text.lower()
    for spec in PATTERN_SPECS:
        if enabled is not None and spec.entity_type not in enabled:
            continue
        for m in spec.pattern.finditer(text):
            score = spec.score
            if spec.context:
                lo = max(0, m.start() - CONTEXT_WINDOW)
                window = lowered[lo : m.start()]
                if any(w in window for w in spec.context):
                    score = min(1.0, score + CONTEXT_BOOST)
            out.append((spec.entity_type, m.start(), m.end(), score))
    return out
