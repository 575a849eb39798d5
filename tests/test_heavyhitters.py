"""Exact heavy hitters (operators/heavyhitters.py): brute-force
equality, partition/order invariance of the OUTPUT (summary contents
may differ), the strict-> boundary, DuckDB live parity on the real
corpus tokens, and the applicability guards."""

import random
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from uk_ner_presidio_demo_spark.operators.heavyhitters import (
    exact_heavy_hitters,
)


def _brute(values, phi):
    counts: dict = {}
    vals = [v for v in values if v is not None]
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    frac = Fraction(str(phi))
    n = len(vals)
    return {
        v: c for v, c in counts.items()
        if c * frac.denominator > frac.numerator * n
    }


@pytest.mark.parametrize("parts", [1, 7])
@pytest.mark.parametrize("phi", [0.5, 0.1, 0.03])
def test_matches_brute_and_partition_invariant(spark, parts, phi):
    """Zipf-ish random multiset: output must equal the brute filter at
    ANY partitioning — MG summary contents are order-dependent, the
    recount-filtered output is not."""
    rng = random.Random(31)
    values = [f"w{int(rng.paretovariate(1.1)) % 40}" for _ in range(5000)]
    df = spark.createDataFrame(
        [(v,) for v in values], "tok string"
    ).repartition(parts)
    got = {
        r.value: r.n_occurrences
        for r in exact_heavy_hitters(df, "tok", phi).collect()
    }
    assert got == _brute(values, phi)


def test_strict_boundary_and_nulls(spark):
    """count == phi * n is NOT a heavy hitter (strict >), and NULLs
    count neither as values nor toward n."""
    # n = 10 non-null; 'a' x 2 (== 0.2*10, excluded), 'b' x 3 (included)
    values = ["a"] * 2 + ["b"] * 3 + [f"x{i}" for i in range(5)] + [None] * 4
    df = spark.createDataFrame([(v,) for v in values], "tok string")
    got = {
        r.value: r.n_occurrences
        for r in exact_heavy_hitters(df, "tok", 0.2).collect()
    }
    assert got == {"b": 3}


def test_matches_duckdb_live(spark, sf001):
    """Engine vs DuckDB GROUP BY ... HAVING over the real corpus's ws
    tokens (integer threshold arithmetic on both sides)."""
    import duckdb

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    toks = docs.select(
        F.explode(
            F.array_remove(F.split(F.trim(F.lower("text")), r"\s+"), "")
        ).alias("tok")
    )
    phi = 0.002
    frac = Fraction(str(phi))
    got = {
        r.value: r.n_occurrences
        for r in exact_heavy_hitters(toks, "tok", phi).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet')"
    )
    want = {
        v: int(c)
        for v, c in con.execute(f"""
            WITH toks AS (
                SELECT t.tok FROM (
                    SELECT unnest(regexp_split_to_array(
                        trim(lower(text)), '\\s+')) AS tok
                    FROM documents
                ) t WHERE t.tok <> ''
            )
            SELECT tok, count(*) AS c FROM toks GROUP BY tok
            HAVING count(*) * {frac.denominator}
                 > {frac.numerator} * (SELECT count(*) FROM toks)
        """).fetchall()
    }
    assert got == want and len(got) > 0


def test_guards(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    for phi in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="phi"):
            exact_heavy_hitters(df, "tok", phi)
    with pytest.raises(ValueError, match="capacity"):
        exact_heavy_hitters(df, "tok", 1e-9)


def test_plan_hygiene(spark, sf001):
    """One mapInPandas (the bounded MG kernel) and nothing else in
    Python; no cartesian; the recount side is a semi join + hash
    aggregate."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    out = exact_heavy_hitters(toks, "tok", 0.01)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_numeric_column_roundtrip(spark):
    """The MG kernel emits an object-dtype key series — numeric columns
    must round-trip through Arrow back to their declared type."""
    df = spark.createDataFrame(
        [(i % 5,) for i in range(100)] + [(None,)], "x long"
    ).repartition(4)
    got = sorted(
        map(tuple, exact_heavy_hitters(df, "x", 0.15).collect())
    )
    assert got == [(v, 20) for v in range(5)]
    assert dict(exact_heavy_hitters(df, "x", 0.15).dtypes)["value"] \
        == "bigint"
