"""Bit-equality of the pure-Python xxhash64 twin against Spark's JVM
implementation — the twin underwrites every oracle that must reproduce an
engine hash-bucket assignment (sequence packing's pack ids)."""

import random

from pyspark.sql import functions as F

from uk_ner_presidio_demo_spark.semantics.sparkhash import (
    pmod, xxhash64_long,
)

EDGES = [0, 1, -1, 42, 2**63 - 1, -(2**63), 2**32, -(2**32), 499]


def test_xxhash64_long_bit_equality(spark):
    rng = random.Random(20260816)
    vals = EDGES + [rng.randint(-(2**63), 2**63 - 1) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v",
        F.xxhash64("v").alias("h"),
        F.pmod(F.xxhash64("v"), F.lit(32)).alias("b32"),
        F.pmod(F.xxhash64("v"), F.lit(7)).alias("b7"),
    )
    for r in df.collect():
        h = xxhash64_long(r.v)
        assert h == r.h, f"hash mismatch for {r.v}"
        assert pmod(h, 32) == r.b32
        assert pmod(h, 7) == r.b7
