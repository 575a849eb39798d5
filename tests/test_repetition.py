"""Repetition quality signals: the mapInPandas kernel must match an
INDEPENDENT DuckDB SQL implementation (list comprehensions over the token
array) on the full corpus, and behave correctly on crafted repetitive
docs."""

import pandas as pd

from tests.harness import compare_frames, duckdb_conn
from uk_ner_presidio_demo_spark.operators.repetition import (
    repetition_keep, repetition_stats,
)
from uk_ner_presidio_demo_spark.sources.tables import read_tpch

ORACLE_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') arr
  FROM documents
),
g AS (
  SELECT doc_id,
         [arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
          for i in generate_series(1, len(arr) - 2)] AS g3,
         [arr[i] || ' ' || arr[i+1]
          for i in generate_series(1, len(arr) - 1)] AS g2
  FROM d
),
m AS (
  SELECT doc_id, max(c) AS mc FROM (
    SELECT doc_id, x, count(*) AS c
    FROM (SELECT doc_id, unnest(g2) AS x FROM g)
    GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT g.doc_id,
       CAST(len(g3) AS BIGINT) AS n_3grams,
       CASE WHEN len(g3) = 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
       END AS dup_3gram_frac,
       CAST(len(g2) AS BIGINT) AS n_2grams,
       CASE WHEN len(g2) = 0 THEN 0.0
            ELSE CAST(coalesce(m.mc, 0) AS DOUBLE) / len(g2)
       END AS top_2gram_frac
FROM g LEFT JOIN m ON g.doc_id = m.doc_id
"""


def test_repetition_matches_independent_sql_oracle(spark, sf01):
    got = repetition_stats(read_tpch(spark, sf01, "documents")).toPandas()
    want = duckdb_conn(sf01).execute(ORACLE_SQL).fetchdf()
    assert not compare_frames(got, want)


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_repetition_signals_on_crafted_docs(spark):
    spam = "купити дешево " * 30            # one 2-gram everywhere
    clean = " ".join(f"слово{i}" for i in range(40))
    short = "лише два"
    stats = {
        r["doc_id"]: r
        for r in repetition_stats(
            _mk_docs(spark, [spam, clean, short])
        ).collect()
    }
    assert stats[0]["dup_3gram_frac"] > 0.9
    assert stats[0]["top_2gram_frac"] > 0.4
    assert stats[1]["dup_3gram_frac"] == 0.0
    assert stats[2]["n_3grams"] == 0 and stats[2]["dup_3gram_frac"] == 0.0
    assert stats[2]["n_2grams"] == 1 and stats[2]["top_2gram_frac"] == 1.0


def test_repetition_keep_drops_only_spam(spark):
    spam = "те саме знову і " * 25
    clean = " ".join(f"токен{i} зміст{i}" for i in range(30))
    docs = _mk_docs(spark, [spam, clean])
    kept = [r["doc_id"] for r in repetition_keep(docs).select("doc_id").collect()]
    assert kept == [1]


def test_repetition_plan_is_single_crossing_no_shuffle(spark, sf01):
    df = repetition_stats(read_tpch(spark, sf01, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


FREQ_ORACLE_SQL = r"""
WITH toks AS (
  SELECT doc_id, t.token FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
  ) t WHERE t.token <> ''
),
counts AS (SELECT token, count(*) AS tok_count FROM toks GROUP BY token)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tok_count) AS BIGINT) AS freq_mass,
       CAST(sum(CASE WHEN tok_count = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
       CAST(sum(tok_count) AS BIGINT) / CAST(count(*) AS BIGINT)
           AS mean_tok_freq
FROM toks JOIN counts USING (token)
GROUP BY doc_id
"""


def test_doc_freq_profile_matches_live_sql(spark, sf01):
    from uk_ner_presidio_demo_spark.operators.textstats import (
        doc_freq_profile,
    )

    got = doc_freq_profile(read_tpch(spark, sf01, "documents")).toPandas()
    want = duckdb_conn(sf01).execute(FREQ_ORACLE_SQL).fetchdf()
    assert not compare_frames(got, want)
