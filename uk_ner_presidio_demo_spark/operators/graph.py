"""Edge-table maintenance: roll canonical triples up to weighted edges and
MERGE a new batch into a standing edge snapshot (the Iceberg `MERGE INTO`
shape, expressed as a Catalyst full-outer join).

This is the missing step between the repo's continuous-KG pieces: the
streaming triples operator (streaming/kg_stream.py) and the delta
canonicalizer (operators/canonicalize.py:incremental_canonical_update)
produce canonical triples per micro-batch; a production deployment folds
each batch into the standing `kg.edges` table rather than rewriting it.
The reference demo rebuilds its per-text result set from scratch on every
analyze call (core/batch_analyzer.py — stateless per run); at 10^12-turn
scale the standing graph is the expensive artifact and must be maintained
incrementally.

Scale shape (100 TB):
- The delta side aggregates FIRST (`edge_rollup` — count per key with
  map-side partial aggregation), so the merge join sees one row per
  distinct new edge, not the raw triple stream.
- The standing snapshot is bucketed by the edge key in the Iceberg layout
  (plans/pipeline.py materializes edges bucketed by conv_id for scan
  locality; a MERGE-maintained table buckets by (subj, pred, obj) instead
  so this join is co-located and shuffle-free on the big side).
- Edge stats are ADDITIVE (counts), so merges compose: fold(batch1,
  batch2) == fold(batch1 ∪ batch2) — property-tested.  Non-additive stats
  (distinct convs) deliberately stay out of the snapshot; they live in
  periodic full recomputes like the CC relabel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_KEY = ["subj", "pred", "obj"]


def edge_rollup(ctriples: DataFrame) -> DataFrame:
    """(subj, pred, obj, n_obs) — weighted-edge grain from canonical
    triples.  One hash aggregate; partial aggregation shrinks hot edges
    (the 'shares_pii_with' hub kind) to one row per map task before the
    shuffle, the same algebraic-agg argument as the CC min-label groupBy
    (SCALE.md §7b, entity-universe leg)."""
    return ctriples.groupBy(*EDGE_KEY).agg(F.count("*").alias("n_obs"))


def merge_edge_snapshots(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """MERGE a delta edge rollup into a standing snapshot.

    Input grain: both frames at (subj, pred, obj, n_obs).
    Output: (subj, pred, obj, n_obs, change_kind) where n_obs is the
    summed observation count and change_kind is
      'inserted'  — edge new in this batch,
      'updated'   — edge in both (weight increased),
      'carried'   — edge in the snapshot only (carried forward unchanged).

    The full-outer join IS the MERGE: matched -> update, not-matched-by
    -target -> insert, not-matched-by-source -> carry.  No row is ever
    dropped, so sum(n_obs) is conserved (property-tested in
    tests/test_edge_upsert.py)."""
    p = prev.select(*EDGE_KEY, F.col("n_obs").alias("_prev_obs"))
    d = delta.select(*EDGE_KEY, F.col("n_obs").alias("_new_obs"))
    j = p.join(d, EDGE_KEY, "full_outer")
    change = (
        F.when(F.col("_prev_obs").isNull(), F.lit("inserted"))
        .when(F.col("_new_obs").isNull(), F.lit("carried"))
        .otherwise(F.lit("updated"))
    )
    return j.select(
        *EDGE_KEY,
        (
            F.coalesce("_prev_obs", F.lit(0)) + F.coalesce("_new_obs", F.lit(0))
        ).alias("n_obs"),
        change.alias("change_kind"),
    )
