"""Degree-oriented triangle counting (operators/graph.py): closed-form
graphs, orientation-independence of the count, and DuckDB parity on the
real canonical-triples graph at sf0.01."""

import duckdb
import pytest

import __spark_entry__ as em
from uk_ner_presidio_demo_spark.operators.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "subj string, obj string"
    )


@pytest.mark.parametrize(
    "pairs,nodes,edges,tris",
    [
        # K4: C(4,3) = 4 triangles
        ([("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")], 4, 6, 4),
        # 4-cycle: no triangles
        ([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], 4, 4, 0),
        # direction/duplicates/self-loops collapse: one triangle
        ([("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")],
         3, 3, 1),
        # hub star: many edges, zero triangles (orientation sanity)
        ([("hub", f"x{i}") for i in range(20)], 21, 20, 0),
    ],
)
def test_closed_form_graphs(spark, pairs, nodes, edges, tris):
    row = triangle_count(_edges(spark, pairs)).first()
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (nodes, edges, tris)


def test_duckdb_parity_on_kg(spark, sf01):
    """The degree-oriented count equals a naive a<b<c three-way SQL join
    over the golden canonical-triples graph."""
    gct = em._golden("golden_canonical_triples")
    ct = spark.read.parquet(gct)
    got = triangle_count(ct.select("subj", "obj")).first()
    want = duckdb.execute(f"""
        WITH und AS (
            SELECT DISTINCT least(subj, obj) AS u, greatest(subj, obj) AS v
            FROM read_parquet('{gct}') WHERE subj <> obj
        )
        SELECT (SELECT count(*) FROM (
                    SELECT u AS n FROM und UNION SELECT v FROM und
                )) AS n_nodes,
               (SELECT count(*) FROM und) AS n_edges,
               (SELECT count(*)
                FROM und e1
                JOIN und e2 ON e2.u = e1.v
                JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """).fetchone()
    assert (got.n_nodes, got.n_edges, got.n_triangles) == want
