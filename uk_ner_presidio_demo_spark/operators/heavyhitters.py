"""Exact frequent-item mining at corpus scale — the two-pass
Misra-Gries shape:

  pass 1 (candidates): each partition summarizes its stream with a
    bounded MERGEABLE Misra-Gries summary (capacity ceil(1/phi)):
    per Arrow batch, exact `value_counts` merge into the summary, then
    truncate by subtracting the (capacity+1)-th largest count and
    keeping positives (Agarwal et al. mergeable-summaries rule —
    vectorized, no per-row Python).  Each truncation removes at least
    (capacity+1) x s count units while undercounting any key by at
    most s, so total per-key undercount <= n_p / (capacity+1): any
    item with partition count above that SURVIVES.  The guarantee
    lifts to the union by averaging — an item with GLOBAL count >
    phi * n must exceed the local threshold in at least one partition
    — so the union of summaries is a guaranteed SUPERSET of the true
    heavy hitters.  Summary size is bounded by capacity x
    n_partitions, never by data volume, and stays a DataFrame (no
    driver collect).
  pass 2 (exact recount): one left-semi join restricts the corpus to
    candidates, one hash aggregate counts them exactly, and the
    threshold filter discards MG's false positives.

The OUTPUT is therefore exact and deterministic — {x : count(x) >
phi * n} — even though MG summary CONTENTS are arrival-order-dependent
(truncations depend on batch order; the recount makes that
irrelevant).  The threshold compare runs in INTEGER arithmetic
(count * den > num * n with phi recovered as the exact decimal the
caller wrote, the disc_rank pattern), so engines can never disagree
at the boundary.

Scale notes: the input column is scanned three times (candidates,
recount, total) — deliberately NOT localCheckpoint'd: re-reading one
column-pruned parquet column is cheaper at 100 TB than materializing
a corpus-scale checkpoint copy (the checkpoint rule is for expensive
KERNEL outputs, not raw scans).  Spark's own `freqItems` is a
one-pass MG WITHOUT the recount — order-dependent superset
membership, no counts, unusable against an exact oracle; this
operator is the deterministic, oracle-equal form.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Capacity ceiling: ceil(1/phi) counters per partition.  A phi small
# enough to want millions of counters is a different problem (full
# groupBy is fine there) — refuse, like the quantiles domain guard.
MAX_CAPACITY = 1 << 20


def _mg_summarize(capacity: int):
    """mapInPandas kernel: one mergeable-MG summary per PARTITION (the
    iterator spans every batch of the partition), emitting surviving
    keys.  Vectorized: exact per-batch value_counts + truncate-by-
    (capacity+1)-th-largest; counts ride float64 (exact < 2^53 —
    far beyond any partition's row count) because Series.add with
    fill_value promotes, and only the ORDERING feeds the truncation —
    the exact recount happens JVM-side in pass 2."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            vc = pdf["_v"].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > capacity:
                s = acc.nlargest(capacity + 1).iloc[-1]
                acc = acc[acc > s] - s
        keys = [] if acc is None else list(acc.index)
        yield pd.DataFrame({"_v": pd.Series(keys, dtype="object")})

    return fn


def exact_heavy_hitters(
    df: DataFrame, col: str, phi: float
) -> DataFrame:
    """(value, n_occurrences): every value of `col` occurring in MORE
    than phi * N rows (strict >, N = non-null rows), exactly.

    phi must be a decimal literal in (0, 1) with ceil(1/phi) <=
    MAX_CAPACITY.  NULLs are ignored on both sides (a NULL is absence
    of a value, not a value)."""
    frac = Fraction(str(phi))
    if not (0 < frac < 1):
        raise ValueError(
            f"exact_heavy_hitters: phi must be in (0, 1), got {phi}"
        )
    capacity = math.ceil(1 / frac)
    if capacity > MAX_CAPACITY:
        raise ValueError(
            f"exact_heavy_hitters: capacity ceil(1/phi)={capacity} "
            f"exceeds {MAX_CAPACITY}; at that threshold a plain "
            "groupBy is the right plan"
        )
    vals = df.select(F.col(col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    cand = (
        vals.mapInPandas(_mg_summarize(capacity), vals.schema)
        .distinct()
    )
    counts = (
        vals.join(cand, "_v", "left_semi")
        .groupBy("_v")
        .agg(F.count("*").alias("n_occurrences"))
    )
    total = vals.count()
    # integer threshold: count * den > num * total  <=>  count/total > phi.
    # The num*total product is computed in PYTHON (exact bigint) and fed
    # as one literal: two int32-sized lits would multiply as int32 and
    # overflow under ANSI past ~2^31/num rows (ADVICE r7 — the 'rank
    # literal x 85' bug class); lit() auto-widens the product to long.
    # n_occurrences * den stays in Spark: n_occurrences <= total is only
    # known at runtime, and den <= MAX_CAPACITY keeps it in int64 range
    # for any total below ~2^63/den rows.
    keep = (
        counts["n_occurrences"] * F.lit(int(frac.denominator)).cast("long")
        > F.lit(int(frac.numerator) * int(total))
    )
    return counts.filter(keep).select(
        F.col("_v").alias("value"), "n_occurrences"
    )
