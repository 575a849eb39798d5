"""Drop-in single-text facade — the reference's `HybridAnalyzer.analyze`
surface (/root/reference/core/analyzer.py:91-197) for users migrating from
the demo: same call shape, same defaults (strategy "score"), same
validation-raises behavior, same AnalysisResult fields, no Spark required.
The distributed path is `analyze_table` (the same frozen kernels over a
DataFrame).
"""

from __future__ import annotations

from dataclasses import dataclass

from .semantics.anonymize import splice
from .semantics.detect import Mention, detect_mentions
from .semantics.registry import MAX_TEXT_LENGTH


@dataclass
class AnalysisResult:
    """Field-for-field mirror of the reference's AnalysisResult
    (core/analyzer.py:28-38)."""

    entities: list[Mention]
    anonymized_text: str
    original_text: str
    entities_count: int

    def format_entities_list(self) -> str:
        if not self.entities:
            return "Сутностей не знайдено"
        lines = []
        for idx, m in enumerate(self.entities, 1):
            lines.append(
                f"{idx}. {m.entity_type}: '{m.surface}' "
                f"(позиція {m.start}-{m.end}, впевненість {m.score:.2f})"
            )
        return "\n".join(lines)


def _validate(text: str) -> None:
    # raise semantics per core/analyzer.py:199-218
    if not text:
        raise ValueError("Текст не може бути порожнім")
    if not text.strip():
        raise ValueError("Текст не може містити тільки пробіли")
    if len(text) > MAX_TEXT_LENGTH:
        raise ValueError(
            f"Текст завеликий: {len(text)} символів. "
            f"Максимум: {MAX_TEXT_LENGTH}"
        )


def analyze(
    text: str,
    ukrainian_entities: list[str] | None = None,
    presidio_entities: list[str] | None = None,
    conflict_strategy: str = "score",
) -> AnalysisResult:
    """Single-document analyze: validate -> detect (both families, honoring
    the enabled sets, O-6) -> resolve -> anonymize.  Defaults match the
    reference library API (strategy "score"; the UI used "priority")."""
    _validate(text)
    mentions, _ = detect_mentions(
        text,
        strategy=conflict_strategy,
        ner_enabled=None if ukrainian_entities is None
        else frozenset(ukrainian_entities),
        pattern_enabled=None if presidio_entities is None
        else frozenset(presidio_entities),
    )
    anonymized = splice(
        text, [(m.entity_type, m.start, m.end) for m in mentions]
    )
    return AnalysisResult(
        entities=mentions,
        anonymized_text=anonymized,
        original_text=text,
        entities_count=len(mentions),
    )


def analyze_table(transcripts, strategy: str = "priority",
                  with_anonymized: bool = True):
    """The distributed twin: transcripts DataFrame -> detected turns
    (see operators/detect.py)."""
    from .operators.detect import detect_turns

    return detect_turns(transcripts, strategy=strategy,
                        with_anonymized=with_anonymized)
