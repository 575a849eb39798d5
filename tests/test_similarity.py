"""Embedding near-dup: the shipped LSH-blocked path vs its golden, the
quadratic baseline vs the all-pairs golden, and the containment property
linking the two (blocked results are exactly the all-pairs results whose
pair collided in >=1 LSH table)."""

import pandas as pd

from tests.harness import compare_frames
from uk_ner_presidio_demo_spark.operators.similarity import (
    emb_neardup, emb_neardup_lsh,
)
from uk_ner_presidio_demo_spark.oracle.docs_golden import ensure_docs_golden


def _read_emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_emb_neardup_lsh_matches_golden(spark, sf01):
    golden = pd.read_parquet(
        ensure_docs_golden(sf01) / "golden_emb_neardup.parquet"
    )
    got = emb_neardup_lsh(_read_emb(spark, sf01)).toPandas()
    assert not compare_frames(got, golden)
    assert len(got) > 0  # non-degenerate: blocking finds planted pairs


def test_emb_neardup_quadratic_matches_allpairs_golden(spark, sf01):
    golden = pd.read_parquet(
        ensure_docs_golden(sf01) / "golden_emb_neardup_allpairs.parquet"
    )
    got = emb_neardup(_read_emb(spark, sf01)).toPandas()
    assert not compare_frames(got, golden)


def test_lsh_results_are_subset_of_allpairs(spark, sf01):
    d = ensure_docs_golden(sf01)
    blocked = pd.read_parquet(d / "golden_emb_neardup.parquet")
    allp = pd.read_parquet(d / "golden_emb_neardup_allpairs.parquet")
    bset = set(zip(blocked.vec_a, blocked.vec_b))
    aset = set(zip(allp.vec_a, allp.vec_b))
    assert bset <= aset
    # measured recall on the synthetic planted pairs (docsim tuning note)
    assert len(bset) >= 0.7 * len(aset)


def test_distributed_kmeans_bit_identical_to_oracle_trainer(spark, sf01):
    """The distributed Lloyd trainer (int64-quantized partial sums over
    mapInPandas + shuffle agg) must produce EXACTLY the single-process
    trainer's centroids — the determinism claim, asserted directly."""
    import numpy as np

    from uk_ner_presidio_demo_spark.operators.similarity import (
        kmeans_centroids_distributed,
    )
    from uk_ner_presidio_demo_spark.semantics.docsim import kmeans_train

    emb = _read_emb(spark, sf01)
    got = kmeans_centroids_distributed(emb)
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array([[float(x) for x in v] for v in pdf["embedding"]])
    want = kmeans_train(mat)
    assert np.array_equal(got, want)  # bit-identical, not just close
