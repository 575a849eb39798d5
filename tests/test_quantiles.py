"""Exact value-histogram quantiles (operators/quantiles.py): sorted-list
twin equality on adversarial fixed corpora, the DuckDB quantile_disc
live-parity check, the rank contract under hypothesis, and the
applicability guard."""

import math

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_ner_presidio_demo_spark.operators.quantiles import (
    disc_rank, exact_int_quantiles,
)

QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _twin(values, qs):
    s = sorted(values)
    return {float(q): s[disc_rank(q, len(s)) - 1] for q in qs}


@given(st.floats(0.0, 1.0), st.integers(1, 10_000))
@settings(max_examples=300, deadline=None)
def test_disc_rank_contract(q, n):
    """rank is 1-indexed, monotone in q, pinned at both ends, and equals
    the brute 'smallest r with r/n >= q' definition."""
    r = disc_rank(q, n)
    assert 1 <= r <= n
    if q == 0.0:
        assert r == 1
    if q == 1.0:
        assert r == n
    # smallest rank whose cumulative fraction reaches q
    assert r / n >= q or math.isclose(r / n, q)
    if r > 1:
        assert (r - 1) / n < q


@pytest.mark.parametrize("values", [
    [5],                                     # singleton
    [3, 1, 2, 4],                            # distinct
    [1, 1, 1, 1, 1, 9],                      # heavy tie + outlier
    [7] * 100,                               # one value
    [-5, -5, 0, 3, 3, 3, 3, 11],             # negatives + ties
    list(range(50)) + [0] * 200,             # skewed histogram
])
def test_matches_sorted_twin(spark, values):
    df = spark.createDataFrame([(int(v),) for v in values], "x long")
    got = {
        float(r.q): int(r.value)
        for r in exact_int_quantiles(df, "x", QS).collect()
    }
    assert got == _twin(values, QS)


def test_matches_duckdb_quantile_disc_live(spark, sf001):
    """Engine vs DuckDB quantile_disc over length(text) of the real
    corpus — exact integer equality at every q."""
    import duckdb

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    got = {
        float(r.q): int(r.value)
        for r in exact_int_quantiles(
            docs.select(F_length()), "v", QS
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet')"
    )
    legs = " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(length(text), {q}) AS v "
        "FROM documents"
        for q in QS
    )
    want = {float(q): int(v) for q, v in con.execute(legs).fetchall()}
    assert got == want


def F_length():
    from pyspark.sql import functions as F

    return F.length("text").alias("v")


def test_nulls_ignored_like_percentile_disc(spark):
    """NULLs must not reach the histogram (they'd sort first in the
    cumulative window and masquerade as the low quantiles); N counts
    non-null rows only — the SQL PERCENTILE_DISC contract."""
    import duckdb

    values = [None, None, 1, 2, 3, 4, None]
    df = spark.createDataFrame([(v,) for v in values], "x long")
    got = {
        float(r.q): int(r.value)
        for r in exact_int_quantiles(df, "x", QS).collect()
    }
    assert got == _twin([v for v in values if v is not None], QS)
    want = {
        float(q): int(v)
        for q, v in duckdb.execute(
            " UNION ALL ".join(
                f"SELECT {q} AS q, quantile_disc(x, {q}) AS v FROM "
                "(VALUES (NULL), (NULL), (1), (2), (3), (4), (NULL)) t(x)"
                for q in QS
            )
        ).fetchall()
    }
    assert got == want


def test_out_of_range_q_rejected(spark):
    df = spark.createDataFrame([(1,)], "x long")
    for q in (-0.1, 1.5):
        with pytest.raises(ValueError, match="outside"):
            exact_int_quantiles(df, "x", [0.5, q])


def test_domain_guard_raises(spark):
    df = spark.range(100).selectExpr("id AS x")
    with pytest.raises(ValueError, match="distinct values"):
        exact_int_quantiles(df, "x", [0.5], max_distinct=10)
    with pytest.raises(ValueError, match="empty"):
        exact_int_quantiles(df.filter("x < 0"), "x", [0.5])


def test_histogram_stage_is_the_only_corpus_scan(spark, sf001):
    """The cumulative window runs over the HISTOGRAM behind the
    localCheckpoint — the final plan must contain no corpus scan and a
    single-partition window over the bounded frame."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = exact_int_quantiles(docs.select(F_length()), "v", QS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower()
    assert "BatchEvalPython" not in plan


def test_grouped_matches_per_group_twin(spark):
    """exact_int_quantiles_by == the sorted-list twin applied per group
    (NULL values dropped per group; NULL keys form their own group)."""
    from uk_ner_presidio_demo_spark.operators.quantiles import (
        exact_int_quantiles_by,
    )

    rows = []
    data = {
        "a": [1, 1, 1, 9, 2],
        "b": [7] * 20,
        "c": [-5, 0, 3, 3, 11, None],
        None: [4, 2],
    }
    for g, vals in data.items():
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {
        (r.g, float(r.q)): int(r.value)
        for r in exact_int_quantiles_by(df, ["g"], "x", QS).collect()
    }
    want = {}
    for g, vals in data.items():
        clean = [v for v in vals if v is not None]
        for q, v in _twin(clean, QS).items():
            want[(g, q)] = v
    assert got == want


def test_grouped_matches_duckdb_live(spark, sf001):
    """Per-group engine quantiles vs DuckDB quantile_disc GROUP BY over
    the real corpus (synthetic doc_id%7 groups, ws token counts)."""
    import duckdb

    from uk_ner_presidio_demo_spark.operators.quantiles import (
        exact_int_quantiles_by,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    grouped = docs.select(
        F.pmod("doc_id", F.lit(7)).cast("long").alias("g"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("v"),
    )
    got = {
        (int(r.g), float(r.q)): int(r.value)
        for r in exact_int_quantiles_by(grouped, ["g"], "v", QS).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet')"
    )
    legs = " UNION ALL ".join(
        f"""SELECT doc_id % 7 AS g, {q} AS q,
            quantile_disc(length(regexp_split_to_array(trim(text),
                          '\\s+')), {q}) AS v
            FROM documents GROUP BY 1"""
        for q in QS
    )
    want = {
        (int(g), float(q)): int(v)
        for g, q, v in con.execute(legs).fetchall()
    }
    assert got == want


def test_catalyst_rank_twin_matches_disc_rank(spark):
    """_rank_expr (decimal Catalyst arithmetic) must equal disc_rank on
    a (q, n) grid including the float-noise boundary cases (0.07*100)
    — the grouped operator's rank is computed distributed, so the twin
    IS the contract."""
    from pyspark.sql import functions as F

    from uk_ner_presidio_demo_spark.operators.quantiles import _rank_expr

    qs = [0.0, 0.07, 0.1, 0.25, 0.3333, 0.5, 0.65, 0.75, 0.9, 0.99,
          0.999, 1.0]
    ns = [1, 2, 3, 7, 10, 99, 100, 101, 1000, 12345]
    pairs = [(q, n) for q in qs for n in ns]
    df = spark.createDataFrame(pairs, "q double, n long")
    got = df.select(
        "q", "n", _rank_expr(F.col("q"), F.col("n")).alias("r")
    ).collect()
    for row in got:
        assert row.r == disc_rank(row.q, row.n), (row.q, row.n)


def test_grouped_guards(spark):
    from uk_ner_presidio_demo_spark.operators.quantiles import (
        exact_int_quantiles_by,
    )

    df = spark.range(100).selectExpr("id % 2 AS g", "id AS x")
    with pytest.raises(ValueError, match="largest group"):
        exact_int_quantiles_by(df, ["g"], "x", [0.5], max_distinct=10)
    with pytest.raises(ValueError, match="empty"):
        exact_int_quantiles_by(df.filter("x < 0"), ["g"], "x", [0.5])
    with pytest.raises(ValueError, match="keys"):
        exact_int_quantiles_by(df, [], "x", [0.5])
    with pytest.raises(ValueError, match="outside"):
        exact_int_quantiles_by(df, ["g"], "x", [1.5])
