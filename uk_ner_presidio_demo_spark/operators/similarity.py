"""Similarity search over the `embeddings` table: brute-force cosine top-k
(baseline) and random-hyperplane-LSH-bucketed top-k (scale path).

Cosine is computed ENTIRELY JVM-side: cast array<float> -> array<double>,
`zip_with` product, `aggregate` sequential fold, `sqrt` norms — no Python in
the hot path, whole-stage-codegen-friendly.  The fold order matches the
oracle's `cosine_seq` exactly, so doubles are bit-identical.

Scale notes: the query set broadcasts (it is small by construction); the
candidate side streams.  Brute force is O(Q x N) — the honest baseline; the
LSH variant prunes candidates to the query's hyperplane bucket (bucket ids
from one Arrow pass), turning the join into an equi-join on bucket id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..semantics.docsim import ANN_K, EMB_NEARDUP_COS, rp_bucket


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_col(a: Column, b: Column) -> Column:
    """Sequential-fold cosine, bit-compatible with semantics.docsim.cosine_seq."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.when(
        (na == 0.0) | (nb == 0.0), F.lit(0.0)
    ).otherwise(dot / (F.sqrt(na) * F.sqrt(nb)))


def _queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        _as_double("embedding").alias("qvec"),
    )


def ann_topk_bruteforce(emb: DataFrame, k: int = ANN_K) -> DataFrame:
    """(query_id, neighbor_id, rank, sim_r6): exact top-k by cosine."""
    from pyspark.sql.window import Window

    q = _queries(emb)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double("embedding").alias("cvec"),
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_col(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("sim", 6).alias("sim_r6"),
        )
    )


@pandas_udf(T.LongType())
def _rp_bucket_udf(vecs: pd.Series) -> pd.Series:
    return pd.Series([rp_bucket([float(x) for x in v]) for v in vecs])


def ann_topk_lsh(emb: DataFrame, k: int = ANN_K) -> DataFrame:
    """LSH-bucketed top-k: candidates limited to the query's hyperplane
    bucket (approximate; deterministic seeded planes)."""
    from pyspark.sql.window import Window

    bucketed = emb.withColumn("bucket", _rp_bucket_udf("embedding"))
    q = bucketed.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        _as_double("embedding").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double("embedding").alias("cvec"),
        F.col("bucket").alias("cbucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("qbucket") == F.col("cbucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_col(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("sim", 6).alias("sim_r6"),
        )
    )


def emb_neardup(emb: DataFrame, threshold: float = EMB_NEARDUP_COS) -> DataFrame:
    """All-pairs cosine >= threshold (baseline; LSH prunes at scale)."""
    a = emb.select(
        F.col("vec_id").alias("vec_a"), _as_double("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), _as_double("embedding").alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos_r6"))
    )
