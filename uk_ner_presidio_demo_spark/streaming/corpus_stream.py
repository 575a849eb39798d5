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

from ..operators.contamination import _fingerprints, fp_expr
from ..operators.dedup import _band_rows


def streaming_decontaminate(docs_stream: DataFrame,
                            eval_docs: DataFrame) -> DataFrame:
    """Exact-level ingest gate: drop streamed docs whose normalized
    fingerprint appears in the static eval suite.  Schema-preserving
    (the join key lives in a collision-proof temp column, so an input
    that already carries an `fp` column passes through untouched); the
    fingerprint expression is SHARED with the batch audit
    (operators/contamination.py fp_expr) by import, not by copy."""
    fps = _fingerprints(eval_docs).select(
        F.col("fp").alias("_decon_fp")
    ).distinct()
    cols = docs_stream.columns
    return (
        docs_stream.withColumn("_decon_fp", fp_expr())
        .join(F.broadcast(fps), "_decon_fp", "left_anti")
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


def streaming_lm_filter(docs_stream: DataFrame,
                        model_rows: list[tuple]) -> DataFrame:
    """LM-quality gate AT INGEST: score each arriving document against a
    FROZEN, bounded bigram model and drop the atypical tail.
    Schema-preserving, stateless — one mapInPandas, no watermark, no
    state store (the streaming_decontaminate shape, with the model in
    the task closure instead of a broadcast join side).

    `model_rows` is the [(w1, w2, lp_fp)] slice from
    operators/lm.py lm_model_top — BOUNDED by construction, trained on
    a reference corpus by a periodic batch job (self-scoring needs
    corpus-global counts, which a stream by definition doesn't have;
    train-on-reference-score-arrivals is the production split, same as
    exact-gate-now/near-batch-later above).  The kernel sums the
    model's PRECOMPUTED integer lp_fp values — FROZEN against the full
    training model's c1; pruning selects WHICH bigrams score, it never
    renormalizes the surviving conditionals (see prune_model's caution
    in semantics/lm.py) — under the frozen tokenizer, with the
    external-model drop semantics (out-of-model bigrams leave both sum
    and count) and the zero-scored-bigram keep.  Tested equal to the
    frozen-lp twin (lm_scores_frozen over frozen_lp_model at a
    genuinely-pruning m), which also cross-checks lm_model_top's lp
    values against counts-derived ones."""
    from ..semantics.bpe import ws_tokens
    from ..semantics.lm import LM_KEEP_MIN_AVG_FP

    model = {(w1, w2): int(lp) for w1, w2, lp in model_rows}
    schema = docs_stream.schema

    def gate(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            keep = []
            for t in pdf["text"]:
                toks = ws_tokens(t if isinstance(t, str) else "")
                lp = 0
                n = 0
                for bg in zip(toks, toks[1:]):
                    v = model.get(bg)
                    if v is not None:
                        lp += v
                        n += 1
                keep.append(n == 0 or lp >= LM_KEEP_MIN_AVG_FP * n)
            out = pdf[keep]
            if len(out):
                yield out

    return docs_stream.mapInPandas(gate, schema)


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
