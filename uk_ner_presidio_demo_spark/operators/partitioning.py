"""Input-parallelism hygiene shared by the corpus-scan kernels."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame) -> DataFrame:
    """Spread a per-row kernel across cores when the input is
    under-partitioned.  A small local corpus is often ONE parquet split =
    ONE partition, so a whole mapInPandas (or the map side of an agg)
    runs on a single core — which both wastes the cluster and makes the
    query wall hostage to per-core host speed (the r5 doc_simhash_dups
    bench fragility; SCALE.md §7f).  At 100 TB the input already has
    thousands of splits and this guard is a no-op — the repartition
    fires only when partitions < defaultParallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
