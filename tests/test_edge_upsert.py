"""Edge-snapshot MERGE (operators/graph.py): unit semantics, conservation
properties, and composition (fold(b1, b2) == fold(b1 ∪ b2))."""

import pyspark.sql.functions as F
import pytest

from uk_ner_presidio_demo_spark.operators.graph import (
    edge_rollup, merge_edge_snapshots,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string, n_obs long")


def test_merge_change_kinds_and_counts(spark):
    prev = _edges(spark, [("a", "p", "b", 3), ("a", "p", "c", 1)])
    delta = _edges(spark, [("a", "p", "b", 2), ("x", "q", "y", 5)])
    got = {
        (r.subj, r.pred, r.obj): (r.n_obs, r.change_kind)
        for r in merge_edge_snapshots(prev, delta).collect()
    }
    assert got == {
        ("a", "p", "b"): (5, "updated"),
        ("a", "p", "c"): (1, "carried"),
        ("x", "q", "y"): (5, "inserted"),
    }


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        (f"conv{i % 7}", i, f"s{i % 5}", "mentions_person", f"o{i % 3}")
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx long, subj string, pred string, obj string"
    )


def test_merge_conserves_observations(spark, triples):
    """No row dropped, no count lost: sum(n_obs) of the merge equals the
    triple count, and the change kinds partition the merged keyspace."""
    is_prev = F.substring(F.md5("conv_id"), 1, 1).isin(*"01234567")
    merged = merge_edge_snapshots(
        edge_rollup(triples.filter(is_prev)),
        edge_rollup(triples.filter(~is_prev)),
    )
    assert merged.agg(F.sum("n_obs")).first()[0] == triples.count()
    kinds = dict(
        merged.groupBy("change_kind").count().rdd
        .map(lambda r: (r[0], r[1])).collect()
    )
    assert set(kinds) <= {"inserted", "updated", "carried"}
    assert merged.count() == merged.select("subj", "pred", "obj").distinct().count()


def test_merge_composes_with_union(spark, triples):
    """Folding two deltas sequentially equals folding their union — the
    additive-stats design contract that makes per-micro-batch MERGE safe."""
    d1 = triples.filter(F.col("turn_idx") % 3 == 0)
    d2 = triples.filter(F.col("turn_idx") % 3 == 1)
    prev = edge_rollup(triples.filter(F.col("turn_idx") % 3 == 2))

    seq = merge_edge_snapshots(
        merge_edge_snapshots(prev, edge_rollup(d1)).drop("change_kind"),
        edge_rollup(d2),
    ).drop("change_kind")
    onego = merge_edge_snapshots(
        prev, edge_rollup(d1.unionByName(d2))
    ).drop("change_kind")
    assert sorted(map(tuple, seq.collect())) == sorted(map(tuple, onego.collect()))
