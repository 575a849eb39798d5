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
planted ~50%-of-events hot user in scripts/skew_bench.py (asof leg);
a key whose row count exceeds a single task's comfort needs ts-range
pre-bucketing (two-phase: per-(key, ts_bucket) window + boundary carry).
Tie semantics: side=0 sorts before side=1, so a right row AT the left
timestamp matches (inclusive, same as DuckDB `ON l.ts >= r.ts`).

Right-side grain: callers must pre-dedupe to one row per (key, ts) —
otherwise "the" match at a timestamp is engine-ambiguous.  `asof_join`
enforces the documented deterministic pick (max pick_col per (key, ts)),
mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_attrs: list[str],
    pick: str,
) -> DataFrame:
    """Backward inclusive as-of join.

    left        — probe rows (kept verbatim, left-join semantics)
    right       — build rows; reduced to one per (key, ts) keeping the
                  row with max `pick` (deterministic, engine-portable)
    right_attrs — right columns carried onto matches (NULL if no right
                  row at-or-before), emitted as `asof_<name>`

    Raises on input columns colliding with the internal temp names
    (`_rn`, `_side`, `_r`, `_match`, `_l_<leftcol>` — ADVICE r6): a
    collision would silently corrupt the join rather than error.
    """
    _reserved = {"_rn", "_side", "_r", "_match"} | {
        f"_l_{c}" for c in left.columns
    }
    bad = sorted(
        (set(left.columns) | set(right.columns)) & _reserved
    )
    if bad:
        raise ValueError(
            f"asof_join: input columns {bad} collide with internal "
            f"temp names (_rn/_side/_r/_match/_l_<col>) — rename them"
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

    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_match")[c].alias(f"asof_{c}") for c in right_attrs],
    )
