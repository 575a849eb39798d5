"""Frozen review-confirmation rule for the two-phase interactive flow.

The reference leaves confirmation to a human (gr.State checkboxes,
/root/reference/ui/interactive_review.py:96-98); the distributed harness
needs a DETERMINISTIC stand-in so the selective-anonymize path is testable:
a reviewer is modeled as confirming high-confidence spans and always
confirming top-priority PII.  Shared by the Spark predicate and the oracle.
"""

from __future__ import annotations

from .registry import priority_of

CONFIRM_MIN_SCORE = 0.9
CONFIRM_MAX_PRIORITY = 2


def is_confirmed(entity_type: str, score: float) -> bool:
    return score >= CONFIRM_MIN_SCORE or priority_of(entity_type) <= CONFIRM_MAX_PRIORITY


def confirmed_predicate():
    """Spark Column twin of `is_confirmed` over mentions columns."""
    from pyspark.sql import functions as F

    from .registry import ENTITY_PRIORITIES

    top = [t for t, p in ENTITY_PRIORITIES.items() if p <= CONFIRM_MAX_PRIORITY]
    return (F.col("score") >= CONFIRM_MIN_SCORE) | F.col("entity_type").isin(top)
