"""Entity linking (stage 6): broadcast alias lookup (J-1) + MinHash/LSH
candidate blocking (J-2, F-8) with exact-Jaccard verification [north-rule].

Scale design (SURVEY.md §4.3):
  - linking operates on DISTINCT (entity_type, norm_surface) pairs, not on
    mentions — the entity universe is orders of magnitude smaller than the
    mention stream, and dedup happens in the same shuffle that feeds it
  - the alias dictionary is explicitly `F.broadcast` (guaranteed broadcast
    hash join, never a shuffle)
  - MinHash signatures are computed by an Arrow-vectorized pandas UDF over
    the distinct entities; band keys explode to (entity_type, band, hash)
    rows and candidate pairs come from an equi-join on the band key — the
    hand-rolled LSH SURVEY.md §2.3 J-2 prefers (deterministic, no ml-lib)
  - a<b ordering dedups pairs; exact Jaccard (shared kernel) verifies
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..semantics.minhash import (
    JACCARD_THRESHOLD, band_keys, jaccard, shingles,
    minhash_signatures_batch,
)

BAND_STRUCT = T.ArrayType(
    T.StructType(
        [T.StructField("band", T.IntegerType()),
         T.StructField("bhash", T.LongType())]
    )
)


@pandas_udf(BAND_STRUCT)
def _band_keys_udf(surfaces: pd.Series) -> pd.Series:
    # vectorized signatures (numpy Mersenne affine-min, bit-identical to
    # minhash_signature — semantics/minhash.py)
    import zlib

    hash_lists = [
        [zlib.crc32(g.encode("utf-8")) for g in shingles(s)]
        for s in surfaces
    ]
    sigs = minhash_signatures_batch(hash_lists)
    return pd.Series([band_keys(sig) for sig in sigs])


@pandas_udf(T.DoubleType())
def _jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([jaccard(x, y) for x, y in zip(a, b)])


def distinct_entities(mentions: DataFrame) -> DataFrame:
    return mentions.select("entity_type", "norm_surface").distinct()


def alias_match(ents: DataFrame, aliases: DataFrame) -> DataFrame:
    """J-1: the broadcast alias lookup — (entity_type, src, dst) edge rows
    for entities whose normalized surface appears in the dictionary."""
    return ents.join(
        F.broadcast(aliases),
        (ents.norm_surface == aliases.alias_norm)
        & (ents.entity_type == aliases.entity_type),
        "inner",
    ).select(
        ents.entity_type.alias("entity_type"),
        ents.norm_surface.alias("src"),
        aliases.canonical_norm.alias("dst"),
    )


def link_entities(mentions: DataFrame, aliases: DataFrame
                  ) -> tuple[DataFrame, DataFrame]:
    """Returns (nodes, edges):
      nodes: (entity_type, norm_surface) — mention entities plus canonical
             targets of matched aliases (frozen node rule, oracle twin in
             oracle/reference_oracle.py:canonicalize)
      edges: (entity_type, src, dst) similarity edges (alias + verified LSH)
    """
    # The distinct entity universe is orders of magnitude smaller than the
    # mention stream; materialize it ONCE (localCheckpoint) so the multiple
    # downstream consumers (alias match, band rows, node set, CC joins)
    # never re-run the detection lineage.
    ents = distinct_entities(mentions).localCheckpoint(eager=True)

    # J-1: broadcast alias lookup
    matched = alias_match(ents, aliases)

    nodes = ents.unionByName(
        matched.select("entity_type", F.col("dst").alias("norm_surface"))
    ).distinct().localCheckpoint(eager=True)

    # J-2: LSH banding over the node set
    banded = nodes.withColumn(
        "bk", F.explode(_band_keys_udf("norm_surface"))
    ).select("entity_type", "norm_surface", "bk.band", "bk.bhash")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.entity_type") == F.col("b.entity_type"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.norm_surface") < F.col("b.norm_surface")),
        )
        .select(
            F.col("a.entity_type").alias("entity_type"),
            F.col("a.norm_surface").alias("src"),
            F.col("b.norm_surface").alias("dst"),
        )
        .distinct()
    )
    verified = pairs.filter(_jaccard_udf("src", "dst") >= JACCARD_THRESHOLD)

    edges = matched.unionByName(verified).distinct()
    return nodes, edges
