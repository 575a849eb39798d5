"""Backward as-of join: match each left row to the most recent right row
at-or-before its timestamp, per key — the time-series join Spark lacks as
a built-in (DuckDB/Pandas `ASOF JOIN` / `merge_asof`; the DuckDB oracle
uses its native ASOF LEFT JOIN, making this one of the few operators with
a first-class engine-native oracle).

Spark-first shape — the UNION + WINDOW trick, NOT a range join:
  1. tag right rows side=0, left rows side=1, union on (key, ts, side);
  2. one window per key ordered by (ts, side):
     `last_value(right_attrs, ignorenulls) rows unbounded preceding`
     carries the latest right row forward onto every left row;
  3. filter side=1.
One shuffle (the window partition), zero range explosion: a naive
l.ts >= r.ts range join is O(|L|·|R|) per key and blows up exactly on the
hot keys; the window form is O((|L|+|R|) log) per key.  Skew caveat
(VERDICT r6): a `Window.partitionBy(key)` partition is INDIVISIBLE — one
pathological key (every click from one user) lands on a single task and
AQE cannot split it; the sort inside that task is O(n log n), so the
bound is one key's row count, not the join fan-out.  Measured under a
planted ~50%-of-events hot user in scripts/skew_bench.py (asof leg).

`asof_join_bucketed` is the hot-key escape hatch (r7): TS-RANGE
PRE-BUCKETING splits every key's rows across ceil(range/width) window
partitions of (key, bucket), then stitches buckets with a per-key
carry-in computed over the tiny bucket-summary frame — three shuffles
instead of one, but the largest window partition is bounded by one
key's rows per `bucket_width` of time, a knob the caller controls.
Output-identical to `asof_join` (property-tested, including planted
hot keys), so the choice is purely physical — run the one-shuffle form
until a key outgrows a task, then switch.

Tie semantics: side=0 sorts before side=1, so a right row AT the left
timestamp matches (inclusive, same as DuckDB `ON l.ts >= r.ts`).

Right-side grain: callers must pre-dedupe to one row per (key, ts) —
otherwise "the" match at a timestamp is engine-ambiguous.  Both
operators enforce the documented deterministic pick (max pick_col per
(key, ts)), mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_INTERNAL = {"_rn", "_side", "_r", "_match", "_b", "_last", "_cin"}


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_attrs: list[str],
    pick: str,
) -> tuple[DataFrame, list[str]]:
    """Shared front half of both as-of forms: collision guard, NULL
    filters, right-side (key, ts) dedupe, side tagging, and the union
    carrying left columns as `_l_<col>` and right attrs as one struct.

    Raises on input columns colliding with the internal temp names
    (`_rn`, `_side`, `_r`, `_match`, `_b`, `_last`, `_cin`,
    `_l_<leftcol>` — ADVICE r6): a collision would silently corrupt
    the join rather than error."""
    _reserved = _INTERNAL | {f"_l_{c}" for c in left.columns}
    bad = sorted((set(left.columns) | set(right.columns)) & _reserved)
    if bad:
        raise ValueError(
            f"asof_join: input columns {bad} collide with internal "
            f"temp names (_rn/_side/_r/_match/_b/_last/_cin/_l_<col>) "
            f"— rename them"
        )
    # NULL-timestamp rows never match (the pandas merge_asof contract,
    # which refuses NULL keys): unfiltered, a NULL-ts right row sorts
    # FIRST in the window and would be carried onto every left row
    # preceding the first real right row.  With the filter, a NULL-ts
    # LEFT row sorts before every right row and correctly gets NULL
    # attrs.  Known engine divergence, chosen deliberately: DuckDB's
    # NATIVE ASOF sort-matcher puts NULLs last and matches NULL-ts
    # probes to NULL-ts builds as an implementation artifact (tested);
    # the driver oracle's events table has non-null ts.
    # NULL keys likewise never match (merge_asof refuses them; ASOF's
    # equi-condition is no-match on NULL) — but NULL-key LEFT rows are
    # still emitted with NULL attrs (left-join semantics): with the
    # right side filtered, their window partition holds no right rows.
    right = right.filter(F.col(ts).isNotNull() & F.col(key).isNotNull())
    # deterministic (key, ts) grain on the right: keep the max-`pick` row
    w_pick = Window.partitionBy(key, ts).orderBy(F.desc(pick))
    r1 = (
        right.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # carry the right attrs as ONE struct: per-attr last(ignorenulls)
    # would stitch values from DIFFERENT right rows whenever a right
    # attr is legitimately NULL — the struct is non-null iff the row is
    # a right row, so the whole match comes from one row
    lcols = left.columns
    tagged_r = r1.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
        F.struct(*right_attrs).alias("_r"),
    )
    rtype = dict(tagged_r.dtypes)["_r"]
    tagged_l = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(rtype).alias("_r"),
    )
    return tagged_r.unionByName(tagged_l), lcols


def _emit(carried: DataFrame, match_col, lcols: list[str],
          right_attrs: list[str]) -> DataFrame:
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[match_col[c].alias(f"asof_{c}") for c in right_attrs],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_attrs: list[str],
    pick: str,
) -> DataFrame:
    """Backward inclusive as-of join (one shuffle; see module
    docstring for the hot-key caveat and the bucketed escape hatch).

    left        — probe rows (kept verbatim, left-join semantics)
    right       — build rows; reduced to one per (key, ts) keeping the
                  row with max `pick` (deterministic, engine-portable)
    right_attrs — right columns carried onto matches (NULL if no right
                  row at-or-before), emitted as `asof_<name>`
    """
    tagged, lcols = _tagged_union(left, right, key, ts, right_attrs, pick)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    return _emit(carried, F.col("_match"), lcols, right_attrs)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_attrs: list[str],
    pick: str,
    bucket_width: int = 3600,
) -> DataFrame:
    """Two-phase backward as-of join — the HOT-KEY physical variant.
    Output-identical to `asof_join` (property-tested); use when one
    key's row count outgrows a single task.

    Phase 1: window per (key, ts-bucket) carries the latest in-bucket
    right row onto each left row — a hot key's rows split across
    ceil(ts_range / bucket_width) indivisible partitions instead of 1.
    Phase 2: per-(key, bucket) summary (the last right struct of each
    bucket — ONE row per key x bucket, the frame a 100-TB run can
    afford a per-key window over) -> `last(ignorenulls) rows unbounded
    preceding to -1` ordered by bucket = the carry-in from strictly
    earlier buckets; joined back on (key, bucket) and coalesced under
    the in-bucket match.

    `bucket_width` is in the ts column's native units (seconds for
    timestamps via second-truncation — any monotonic non-decreasing
    mapping of ts preserves correctness, so sub-second ties within one
    bucket are fine; plain numeric ts uses its own units).  Width is a
    physical knob only: every width produces identical output."""
    if bucket_width <= 0:
        raise ValueError(
            f"asof_join_bucketed: bucket_width must be > 0, "
            f"got {bucket_width}"
        )
    tagged, lcols = _tagged_union(left, right, key, ts, right_attrs, pick)
    sec = (
        F.unix_timestamp(F.col(ts))
        if dict(tagged.dtypes)[ts].startswith("timestamp")
        else F.col(ts)
    )
    tagged = tagged.withColumn(
        "_b", F.floor(sec / F.lit(bucket_width)).cast("long")
    )
    wb = (
        Window.partitionBy(key, "_b")
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "_match", F.last("_r", ignorenulls=True).over(wb)
    )
    # per-bucket summary: the last right row of each (key, bucket).
    # max of struct(ts, _r) orders by ts first; within one (key, ts)
    # the dedupe left exactly one right row, so the _r field never
    # breaks a tie.  Buckets holding only left rows keep a NULL _last
    # so the carry window can skip them (ignorenulls).
    bsum = tagged.groupBy(key, "_b").agg(
        F.max(
            F.when(
                F.col("_side") == 0,
                F.struct(F.col(ts).alias("_t"), F.col("_r").alias("_rr")),
            )
        ).alias("_last")
    )
    wsum = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cin = bsum.select(
        F.col(key), F.col("_b"),
        F.last("_last", ignorenulls=True).over(wsum)
        .getField("_rr").alias("_cin"),
    )
    # every (key, _b) of a surviving left row exists in bsum (grouped
    # from the same tagged frame); NULL-key/NULL-ts left rows fail the
    # equi-join and correctly keep NULL attrs
    joined = carried.filter(F.col("_side") == 1).join(
        cin, [key, "_b"], "left"
    )
    return _emit(
        joined, F.coalesce("_match", "_cin"), lcols, right_attrs
    )
