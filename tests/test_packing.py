"""Sequence packing: deterministic greedy first-fit per hash bucket — the
Spark output must EXACTLY match a single-process oracle applying the same
rule, at any parallelism, and every pack must respect the token budget."""

import pandas as pd
from pyspark.sql import functions as F

from uk_ner_presidio_demo_spark.operators.packing import (
    pack_documents, pack_stats,
)
from uk_ner_presidio_demo_spark.sources.tables import read_tpch

BUDGET = 64
N_BUCKETS = 8


def _oracle(pdf: pd.DataFrame) -> set:
    """Plain-Python twin of the packing rule over (doc_id, n_tokens,
    bucket)."""
    rows = set()
    for bucket, grp in pdf.groupby("bucket"):
        seq, used, pos = 0, 0, 0
        for doc_id, n in sorted(zip(grp["doc_id"], grp["n_tokens"])):
            n = int(n)
            if n > BUDGET:
                if used > 0:
                    seq += 1
                rows.add((f"{bucket}:{seq}", int(doc_id), n, 0, True))
                seq += 1
                used, pos = 0, 0
                continue
            if used + n > BUDGET and used > 0:
                seq += 1
                used, pos = 0, 0
            rows.add((f"{bucket}:{seq}", int(doc_id), n, pos, False))
            used += n
            pos += 1
    return rows


def _expected(spark, sf01):
    docs = read_tpch(spark, sf01, "documents")
    counted = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_tokens"),
        F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("int")
        .alias("bucket"),
    ).toPandas()
    return _oracle(counted), counted


def test_packing_matches_python_oracle(spark, sf01):
    expected, counted = _expected(spark, sf01)
    docs = read_tpch(spark, sf01, "documents")
    got = pack_documents(docs, budget_tokens=BUDGET,
                         n_buckets=N_BUCKETS).toPandas()
    got_set = set(
        map(tuple, got[["pack_id", "doc_id", "n_tokens", "pack_pos",
                        "oversize"]].itertuples(index=False))
    )
    assert got_set == expected
    assert len(got) == len(counted)  # every doc lands in exactly one pack


def test_packing_is_partitioning_invariant(spark, sf01):
    """Same output from a repartitioned input — the bucket key, not the
    physical layout, defines the groups."""
    docs = read_tpch(spark, sf01, "documents")
    a = pack_documents(docs, BUDGET, N_BUCKETS).toPandas()
    b = pack_documents(docs.repartition(3), BUDGET, N_BUCKETS).toPandas()
    key = ["pack_id", "doc_id", "n_tokens", "pack_pos", "oversize"]
    assert set(map(tuple, a[key].itertuples(index=False))) == set(
        map(tuple, b[key].itertuples(index=False))
    )


def test_budget_respected_and_stats(spark, sf01):
    docs = read_tpch(spark, sf01, "documents")
    packs = pack_documents(docs, BUDGET, N_BUCKETS)
    stats = pack_stats(packs, BUDGET).toPandas()
    normal = stats[~stats["has_oversize"]]
    assert (normal["pack_tokens"] <= BUDGET).all()
    assert (normal["fill_ratio"] <= 1.0).all()
    over = stats[stats["has_oversize"]]
    assert (over["n_docs"] == 1).all()  # oversize docs pack alone


def test_trained_bpe_packing_matches_python_oracle(spark, sf01):
    """merges=[...] (r6): pack budgets count the TRAINED tokenizer's
    tokens.  The Spark output must exactly match the single-process twin
    (ws_tokens counts -> deterministic trainer -> encode_text counts ->
    the same greedy rule), and the trained counts must differ from the
    whitespace counts somewhere (the flag changes real behavior)."""
    from uk_ner_presidio_demo_spark.operators.bpe import bpe_train
    from uk_ner_presidio_demo_spark.semantics.bpe import encode_text
    from uk_ner_presidio_demo_spark.semantics.sparkhash import (
        pmod, xxhash64_long,
    )

    docs = read_tpch(spark, sf01, "documents")
    merges = bpe_train(docs, n_merges=32, max_words=2000)
    assert merges
    got = pack_documents(docs, budget_tokens=BUDGET, n_buckets=N_BUCKETS,
                         merges=merges).toPandas()

    pdf = pd.read_parquet(f"{sf01}/documents.parquet")[["doc_id", "text"]]
    cache: dict = {}
    pdf["n_tokens"] = pdf["text"].map(
        lambda t: len(encode_text(t, merges, _cache=cache))
    )
    pdf["bucket"] = pdf["doc_id"].map(
        lambda d: pmod(xxhash64_long(int(d)), N_BUCKETS)
    )
    expected = _oracle(pdf)
    key = ["pack_id", "doc_id", "n_tokens", "pack_pos", "oversize"]
    assert set(map(tuple, got[key].itertuples(index=False))) == expected
    ws = pack_documents(docs, budget_tokens=BUDGET,
                        n_buckets=N_BUCKETS).toPandas()
    assert not ws.set_index("doc_id")["n_tokens"].sort_index().equals(
        got.set_index("doc_id")["n_tokens"].sort_index()
    )


def test_null_text_counts_like_empty(spark):
    """NULL text must not crash the packing kernel: it counts like ""
    (the phantom single ws token), consistently with the trained-merges
    path which maps None -> ""."""
    from uk_ner_presidio_demo_spark.operators.packing import pack_documents

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens
           for r in pack_documents(docs, budget_tokens=8).collect()}
    assert got == {1: 1, 2: 3, 3: 1}


def test_default_buckets_are_cluster_size_independent(spark):
    """The default n_buckets is a fixed constant, never derived from
    defaultParallelism — default-call pack ids must not change with
    cluster size."""
    from uk_ner_presidio_demo_spark.operators.packing import (
        PACK_DEFAULT_BUCKETS, pack_documents,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} w") for i in range(40)], "doc_id long, text string"
    )
    a = sorted((r.doc_id, r.pack_id)
               for r in pack_documents(docs, budget_tokens=8).collect())
    b = sorted((r.doc_id, r.pack_id)
               for r in pack_documents(
                   docs, budget_tokens=8,
                   n_buckets=PACK_DEFAULT_BUCKETS).collect())
    assert a == b
