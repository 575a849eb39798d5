"""Entity-type registry, priorities, and global limits.

Semantics mirrored from the reference (values only, re-stated — NOT a port):
  - 13 Ukrainian NER classes: /root/reference/core/config.py:36-50
  - 8 pattern (Presidio-family) classes: /root/reference/core/config.py:53-62
  - anonymization format "[{entity_type}]": /root/reference/core/config.py:33
  - MAX_TEXT_LENGTH = 100_000: /root/reference/core/config.py:29
  - priority map (lower = higher priority, default 100):
    /root/reference/utils/conflict_resolution.py:71-91
"""

from __future__ import annotations

# --- entity-type vocabulary (closed, static) -------------------------------

NER_ENTITY_TYPES: tuple[str, ...] = (
    "PERS", "ORG", "LOC", "DATE", "TIME", "JOB", "MON", "PCT",
    "PERIOD", "DOC", "QUANT", "ART", "MISC",
)

PATTERN_ENTITY_TYPES: tuple[str, ...] = (
    "EMAIL_ADDRESS", "PHONE_NUMBER", "CREDIT_CARD", "IBAN_CODE",
    "IP_ADDRESS", "URL", "CRYPTO", "DATE_TIME", "UA_IPN",
)

ALL_ENTITY_TYPES: tuple[str, ...] = NER_ENTITY_TYPES + PATTERN_ENTITY_TYPES

# --- conflict-resolution priorities ----------------------------------------
# Lower number = higher priority; types absent from the map default to 100.
# Values match /root/reference/utils/conflict_resolution.py:71-91 exactly.

ENTITY_PRIORITIES: dict[str, int] = {
    "CREDIT_CARD": 1,
    "IBAN_CODE": 1,
    "EMAIL_ADDRESS": 2,
    "PHONE_NUMBER": 2,
    "CRYPTO": 2,
    "UA_IPN": 2,   # north-star IPN class (checksum-validated; OUR spec)
    "PERS": 3,
    "DOC": 3,
    "ORG": 4,
    "LOC": 4,
    "DATE": 5,
    "TIME": 5,
    "MISC": 10,
}

DEFAULT_PRIORITY: int = 100


def priority_of(entity_type: str) -> int:
    return ENTITY_PRIORITIES.get(entity_type, DEFAULT_PRIORITY)


# --- limits and formats -----------------------------------------------------

MAX_TEXT_LENGTH: int = 100_000

# Rewrite format for the anonymization splice (F-1).
ANONYMIZATION_FORMAT: str = "[{entity_type}]"


def replacement_for(entity_type: str) -> str:
    return ANONYMIZATION_FORMAT.format(entity_type=entity_type)


# --- validity predicate (O-5) ----------------------------------------------
# The reference RAISES on invalid input (core/analyzer.py:199-218); the
# distributed engine instead filters + counts rejects into metrics.  The
# predicate itself is identical: non-empty after strip, and within the
# length cap.  Note Python str.strip() strips \x0b\x0c too, which is why
# the Spark-side filter uses a regexp trim over the same class.

PY_WHITESPACE = " \t\n\r\x0b\x0c"


def is_valid_text(text: str | None) -> bool:
    if text is None or not text:
        return False
    if not text.strip():
        return False
    return len(text) <= MAX_TEXT_LENGTH
