"""Mirror of the driver's CORRECTNESS gate: every __spark_entry__ query vs
its DuckDB oracle at sf0.01 (the driver's correctness sf)."""

import pytest

import __spark_entry__ as entrymod
from tests.harness import run_query_pair

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may be absent; keep the list explicit
    assert missing <= set(), f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf01, name):
    problems = run_query_pair(spark, sf01, QUERIES[name], ORACLES[name])
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["entity_type", "norm_surface", "n_mentions"]
