"""Bench harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "turns_per_sec": ...}.
Per-query wall = best of 2 runs (steady state; see the comment at the
timing loop), total = sum of per-query bests.

Execution is forced with the noop sink (full computation, no driver
collect). The KG queries run over the deterministic synthetic transcripts
keyed to the sf dir; relational queries run over the driver's parquet.
"""

from __future__ import annotations

import json
import os
import sys
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # Materialize synth input before timing.
    from uk_ner_presidio_demo_spark.data.synth import (
        SF_CONVS, ensure_transcripts, sf_key_for_dir,
    )

    ensure_transcripts(sf_dir)

    from uk_ner_presidio_demo_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=cores)

    import __spark_entry__ as entrymod

    qmap = dict(entrymod.queries())
    # two r1/r2 headline queries left the 50-slot driver registry in r3
    # (kg_top_surfaces: identical oracle to the salted twin; events_sessions:
    # merged into events_sessionize) — keep benching the same callables so
    # round-over-round per-query comparisons stay name-stable
    qmap.setdefault("kg_top_surfaces", entrymod._q_top_surfaces)
    qmap.setdefault("events_sessions", entrymod._q_events_sessions)
    # name-stable callables for queries that merged/rotated off the 50-slot
    # board (r3: board slots; r4: ann_topk merged into ann_exact_lsh_topk,
    # the r3 off-board six promoted) — bench keeps timing the SAME work
    # under the SAME name so round-over-round per-query ratios stay valid.
    # Exception by design in r4: doc_partial_overlap now times the
    # VERIFIED operator (chunk blocking + exact-span verify) — the r3
    # number covered blocking only.
    qmap.setdefault("ann_topk", entrymod._q_ann_topk)
    qmap.setdefault("ann_pq_topk", entrymod._q_ann_pq_topk)
    headline = [
        "kg_mentions",
        "kg_anonymized",
        "kg_entity_type_counts",
        "kg_top_surfaces",
        "kg_triples",
        "kg_canonical_nodes",
        "doc_neardup_minhash",
        "doc_simhash_dups",
        "doc_contamination",
        "doc_packing",
        "doc_hash_sample",
        "doc_partial_overlap",
        "txt_repetition",
        "txt_freq_profile",
        "ann_topk",
        "ann_pq_topk",
        "ann_ivfpq_topk",
        "txt_quality",
        "tpch_agg",
        "tpch_broadcast_join",
        "tpch_window_topk",
        "events_sessions",
    ]
    headline = [q for q in headline if q in qmap]

    # Warm the python workers / JVM once: a small detection pass spawns the
    # UDF workers and compiles the regex tables (the distributed analogue of
    # the reference's model warm-up, app.py:42-62), so timings below measure
    # engine throughput rather than process spin-up.
    force(qmap["kg_mentions"](spark, "/root/testdata/sf0.001"))
    force(qmap["tpch_agg"](spark, sf_dir))

    # Each query runs twice and reports the BEST wall: this VM's cold
    # first-touch page allocation is up to ~100x slower than steady state,
    # which lands entirely on allocation-heavy plans (localCheckpoint
    # materializations) in a single-shot timing; co-tenant interference is
    # strictly one-sided (it can only slow a run).  Best-of-2 therefore
    # measures engine capability — the same estimator BENCH/BASELINE.md
    # uses for the scaling levels.
    timings: dict[str, float] = {}
    for name in headline:
        walls = []
        for _ in range(2):
            t0 = time.time()
            force(qmap[name](spark, sf_dir))
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)
    total = round(sum(timings.values()), 3)

    # turns/sec over the full detection pass (the BASELINE throughput metric)
    from uk_ner_presidio_demo_spark.sources.tables import read_transcripts

    n_turns = read_transcripts(spark, sf_dir).count()
    det_sec = timings.get("kg_mentions", None)
    turns_per_sec = round(n_turns / det_sec, 1) if det_sec else None

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                # recorded so bench_regressions can warn when two rounds
                # used different wall estimators (ADVICE r2)
                "estimator": "best_of_2",
                "queries": timings,
                "sf": sf_key_for_dir(sf_dir),
                "cores": cores,
                "n_turns": n_turns,
                "n_convs": SF_CONVS.get(sf_key_for_dir(sf_dir)),
                "turns_per_sec_detection": turns_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
