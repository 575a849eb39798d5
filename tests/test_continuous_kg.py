"""Continuous-KG integration parity (VERDICT r3 #9 stretch): the
production operating mode — a standing KG built by batch, new
conversations arriving as a STREAM (streaming_triples), their entities
canonicalized by the DELTA path (incremental_canonical_update), and a
periodic full-CC reconcile — must end in exactly the state a from-scratch
batch run over the same corpus produces.

Claims proven here:
  1. epoch-2 streaming triples == epoch-2 batch triples (across real
     micro-batches, availableNow).
  2. the continuous canon (standing ∪ delta) maps to the reconciled
     canon as a FUNCTION: reconcile only MERGES continuous clusters,
     never splits one (the delta path's monotone-safety, end to end).
  3. remapping the continuously-produced canonical triples through that
     merge map yields EXACTLY the from-scratch canonical triples.
"""

import pandas as pd
from pyspark.sql import functions as F

from uk_ner_presidio_demo_spark.data.synth import ensure_transcripts
from uk_ner_presidio_demo_spark.operators.canonicalize import (
    canonical_nodes, canonical_triples, incremental_canonical_update,
)
from uk_ner_presidio_demo_spark.operators.detect import (
    detect_turns, mentions_from_turns,
)
from uk_ner_presidio_demo_spark.operators.linking import link_entities
from uk_ner_presidio_demo_spark.operators.triples import emit_triples
from uk_ner_presidio_demo_spark.sources.tables import (
    read_aliases, read_transcripts,
)
from uk_ner_presidio_demo_spark.streaming.detect_stream import (
    run_available_now,
)
from uk_ner_presidio_demo_spark.streaming.kg_stream import (
    streaming_triples, write_conv_ordered_source,
)

TRIPLE_KEY = ["conv_id", "turn_idx", "subj", "pred", "obj"]


def _mentions(tr):
    return mentions_from_turns(detect_turns(tr, with_anonymized=False))


def _canon(spark, mentions):
    nodes, edges = link_entities(mentions, read_aliases(spark))
    return canonical_nodes(nodes, edges)


def _triple_set(pdf: pd.DataFrame) -> set:
    return set(map(tuple, pdf[TRIPLE_KEY].itertuples(index=False)))


def test_continuous_kg_reconcile_equals_batch(spark, sf001, tmp_path):
    tr_all = read_transcripts(spark, sf001).localCheckpoint(eager=True)
    convs = sorted(
        r["conv_id"] for r in tr_all.select("conv_id").distinct().collect()
    )
    assert len(convs) >= 4
    epoch1 = convs[: len(convs) // 2]
    tr1 = tr_all.filter(F.col("conv_id").isin(epoch1))
    tr2 = tr_all.filter(~F.col("conv_id").isin(epoch1))

    # ---- standing KG from the epoch-1 batch run ----
    m1 = _mentions(tr1).localCheckpoint(eager=True)
    canon1 = _canon(spark, m1).localCheckpoint(eager=True)
    triples1 = emit_triples(tr1, m1)

    # ---- epoch 2 arrives as a real stream (micro-batched files) ----
    full2 = (
        tr2.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
    )
    full2["turn_idx"] = full2["turn_idx"].astype("int32")
    full2["ts"] = full2["ts"].astype("datetime64[us]")
    src = write_conv_ordered_source(tmp_path / "src", full2, span=5)
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    stream_t2 = run_available_now(
        streaming_triples(stream), "continuous_kg_triples",
        str(tmp_path / "ck"), "append",
    ).toPandas()

    # claim 1: the stream converged to the epoch-2 batch triples
    m2 = _mentions(tr2).localCheckpoint(eager=True)
    batch_t2 = emit_triples(tr2, m2).toPandas()
    assert _triple_set(stream_t2) == _triple_set(batch_t2)
    assert len(stream_t2) == len(_triple_set(stream_t2))  # exactly-once

    # ---- delta canonicalization of epoch-2 entities vs standing canon ----
    delta2 = incremental_canonical_update(m2, canon1)
    canon_cont = canon1.select(
        "entity_type", "norm_surface", "canonical_id"
    ).unionByName(
        delta2.select("entity_type", "norm_surface", "canonical_id")
    ).distinct().localCheckpoint(eager=True)

    # continuously-produced canonical triples: epoch-1 batch + epoch-2
    # stream output, both rewritten through the continuous canon
    stream_t2_df = spark.createDataFrame(stream_t2)
    cont_ct = canonical_triples(
        triples1.unionByName(stream_t2_df.select(*TRIPLE_KEY)), canon_cont
    ).toPandas()

    # ---- periodic reconcile == from-scratch batch over the full corpus ----
    m_all = _mentions(tr_all).localCheckpoint(eager=True)
    canon_full = _canon(spark, m_all).localCheckpoint(eager=True)
    scratch_ct = canonical_triples(
        emit_triples(tr_all, m_all), canon_full
    ).toPandas()

    # claim 2: continuous id -> reconciled id is a function (merge-only)
    idmap_pdf = (
        canon_cont.alias("c")
        .join(
            canon_full.select(
                "entity_type", "norm_surface",
                F.col("canonical_id").alias("reconciled_id"),
            ).alias("f"),
            ["entity_type", "norm_surface"],
        )
        .select(F.col("canonical_id").alias("cont_id"), "reconciled_id")
        .distinct()
        .toPandas()
    )
    fanout = idmap_pdf.groupby("cont_id")["reconciled_id"].nunique()
    assert (fanout == 1).all(), (
        "reconcile SPLIT a continuous cluster — delta path lost "
        "monotone-safety"
    )

    # claim 3: remapped continuous canonical triples == from-scratch ones
    idmap = dict(zip(idmap_pdf["cont_id"], idmap_pdf["reconciled_id"]))
    for col in ("subj", "obj"):
        cont_ct[col] = cont_ct[col].map(lambda v: idmap.get(v, v))
    assert _triple_set(cont_ct) == _triple_set(scratch_ct)
    assert len(scratch_ct)  # non-vacuous
