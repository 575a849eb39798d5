"""Streaming corpus hygiene — contamination gating at ingest time.

Production split (how large pipelines actually run decontamination):
  - EXACT level gates the INGEST STREAM: a stream-static LEFT ANTI join
    against the (small, broadcast) eval-suite fingerprint table drops
    byte-identical-after-normalization leaks the moment they arrive.
    Stateless — no watermark, no state store; the static side is
    re-broadcast per micro-batch, so an updated eval suite takes effect
    on the next trigger.
  - NEAR level (MinHash banding + Jaccard verify) stays a PERIODIC BATCH
    job (operators/contamination.py decontaminate) over the accumulated
    corpus — band blocking wants the full candidate set, and near-dup
    leakage does not need single-event latency.

`streaming_contamination_alerts` additionally surfaces near-level
CANDIDATES (band collisions vs the eval suite) as an at-least-once alert
stream — band keys can collide more than once per pair, so consumers
dedupe on (doc_id, eval_doc_id); exact-Jaccard confirmation happens in
the batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.contamination import _fingerprints
from ..operators.dedup import _band_rows


def _fp_expr():
    return F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))


def streaming_decontaminate(docs_stream: DataFrame,
                            eval_docs: DataFrame) -> DataFrame:
    """Exact-level ingest gate: drop streamed docs whose normalized
    fingerprint appears in the static eval suite.  Schema-preserving."""
    fps = _fingerprints(eval_docs).select("fp").distinct()
    cols = docs_stream.columns
    return (
        docs_stream.withColumn("fp", _fp_expr())
        .join(F.broadcast(fps), "fp", "left_anti")
        .select(*cols)
    )


def streaming_contamination_alerts(docs_stream: DataFrame,
                                   eval_docs: DataFrame) -> DataFrame:
    """Near-level candidate alerts: (doc_id, eval_doc_id) for every band
    collision between a streamed doc and the static eval suite.
    At-least-once per pair (one row per colliding band); downstream
    consumers dedupe and the periodic batch decontaminate confirms with
    exact Jaccard."""
    eval_bands = _band_rows(eval_docs) \
        .withColumnRenamed("doc_id", "eval_doc_id") \
        .localCheckpoint(eager=True)  # static side: materialize once
    stream_bands = _band_rows(docs_stream.select("doc_id", "text"))
    return stream_bands.join(
        F.broadcast(eval_bands), ["band", "bhash"]
    ).select("doc_id", "eval_doc_id")


def streaming_scrub(docs_stream: DataFrame,
                    strategy: str = "priority") -> DataFrame:
    """PII scrub AT INGEST: the stateless scrub kernel (detect + splice,
    one mapInPandas, zero shuffles — operators/scrub.py) lifts unchanged
    onto the document stream, completing the streaming corpus hygiene
    trio: decontaminate (exact gate) -> scrub -> downstream batch
    near-dedup/pack.  Output is byte-identical to the batch operator on
    the same rows (tested), because the kernel is per-row pure."""
    from ..operators.scrub import scrub_documents

    return scrub_documents(docs_stream, strategy=strategy)
