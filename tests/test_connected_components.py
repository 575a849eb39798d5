"""Direct unit tests for the iterative connected-components operator —
protects the fused-init/pointer-jump refactors with graph shapes the
golden corpus doesn't stress (long chains, isolated singletons, multiple
components per entity type)."""

from pyspark.sql import functions as F

from uk_ner_presidio_demo_spark.operators.canonicalize import (
    connected_components,
)


def _run(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame(
        [("T", n) for n in node_ids], "entity_type string, norm_surface string"
    )
    edges = spark.createDataFrame(
        [("T", a, b) for a, b in edge_pairs],
        "entity_type string, src string, dst string",
    )
    out = connected_components(nodes, edges)
    return {r.norm_surface: r.label for r in out.collect()}


def test_chain_converges_to_global_min(spark):
    """A 9-node chain (diameter 8) forces multiple pointer-jump rounds;
    every node must still take the chain's minimum id."""
    chain = [f"n{i}" for i in range(9)]
    edges = list(zip(chain, chain[1:]))
    got = _run(spark, chain, edges)
    assert set(got.values()) == {"T:n0"}


def test_star_plus_singletons_and_two_components(spark):
    nodes = ["a", "b", "c", "m", "x", "y", "lone1", "lone2"]
    #   star a-b, a-c (min a);   pair x-y (min x);   m links to the star
    edges = [("b", "a"), ("a", "c"), ("m", "c"), ("y", "x")]
    got = _run(spark, nodes, edges)
    assert got["a"] == got["b"] == got["c"] == got["m"] == "T:a"
    assert got["x"] == got["y"] == "T:x"
    assert got["lone1"] == "T:lone1"  # singleton bypass: own id
    assert got["lone2"] == "T:lone2"


def test_components_never_span_entity_types(spark):
    nodes = spark.createDataFrame(
        [("A", "s"), ("B", "s"), ("A", "t")],
        "entity_type string, norm_surface string",
    )
    edges = spark.createDataFrame(
        [("A", "s", "t")], "entity_type string, src string, dst string"
    )
    out = {(r.entity_type, r.norm_surface): r.label
           for r in connected_components(nodes, edges).collect()}
    assert out[("A", "s")] == out[("A", "t")] == "A:s"
    assert out[("B", "s")] == "B:s"  # same surface, other type: untouched


def test_empty_edges_all_singletons(spark):
    got = _run(spark, ["p", "q"], [])
    assert got == {"p": "T:p", "q": "T:q"}
