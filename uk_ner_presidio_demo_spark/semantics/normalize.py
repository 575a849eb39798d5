"""Surface normalization (F-7) — shared linking key for engine and oracle.

Pure-Python implementation plus a mirrored Spark Column expression builder.
Both MUST stay in lock-step: `norm_surface_expr` is the Catalyst-native
translation used on DataFrames; `norm_surface` is the Python twin used inside
the oracle and the MinHash kernel.  A unit test asserts they agree on the
gazetteer + fuzz corpus.

Rule (frozen):
  1. lowercase
  2. any run of non-(letter|digit) chars — punctuation, apostrophe family,
     whitespace, underscores — collapses to a single space (one character
     class, NOT an alternation: `[^\\w]+|_+` failed idempotency on mixed
     underscore+punct runs, found by hypothesis)
  3. trim
"""

from __future__ import annotations

import re

_NON_ALNUM = re.compile(r"[\W_]+", re.UNICODE)


def norm_surface(s: str) -> str:
    return _NON_ALNUM.sub(" ", s.lower()).strip()


def norm_surface_expr(col):
    """Spark Column twin of `norm_surface` (import-guarded: pure callers of
    this module never need pyspark)."""
    from pyspark.sql import functions as F

    # \W in Java regex with UNICODE_CHARACTER_CLASS matches the same class as
    # Python's [^\w]; Spark's regexp_replace compiles with (?U) when given.
    return F.trim(F.regexp_replace(F.lower(col), r"(?U)[\W_]+", " "))
