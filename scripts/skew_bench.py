"""Skew evidence for the triples cogroup and the salted hot-key aggregate
(VERDICT r2 #7): measured max vs median task wall inside the relevant
stages, plus the underlying per-bucket row skew, at two sfs.

The synth corpus deliberately plants skew (data/synth.py): one ~200-turn
hot conversation (conv skew -> one cogroup bucket gets heavier) and one
celebrity entity surface (key skew -> one reducer in a naive groupBy).
This script quantifies what that does to task walls:

  - `triples_bucket_rows`: rows per cogroup hash bucket (deterministic —
    the skew itself, independent of host noise).
  - per-stage `executorRunTime` quantiles from the Spark status REST API
    (max/median task ratio — the stage-wall amplification the skew causes;
    noisy on this drifting host, so read ratios, not absolute ms).
  - the salted vs unsalted top-surfaces aggregate, same metrics.

Usage: python scripts/skew_bench.py 2>/dev/null   (prints ONE JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def _completed_stages(spark):
    return {s["stageId"]: s for s in _rest(spark, "/stages?status=complete")}


def _task_quantiles(spark, stage_id: int, attempt: int):
    ts = _rest(
        spark,
        f"/stages/{stage_id}/{attempt}/taskSummary"
        f"?quantiles=0.0,0.5,1.0",
    )
    lo, med, hi = ts["executorRunTime"]
    return {"min_ms": lo, "median_ms": med, "max_ms": hi,
            "max_over_median": round(hi / med, 2) if med else None}


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _new_heavy_stages(spark, before: set[int], min_tasks: int, top: int = 2):
    """The `top` new stages by total executorRunTime with >= min_tasks."""
    stages = [
        s for sid, s in _completed_stages(spark).items()
        if sid not in before and s["numCompleteTasks"] >= min_tasks
    ]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    out = []
    for s in stages[:top]:
        q = _task_quantiles(spark, s["stageId"], s["attemptId"])
        out.append({
            "stage_id": s["stageId"],
            "n_tasks": s["numCompleteTasks"],
            "total_run_ms": s.get("executorRunTime"),
            **q,
        })
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    cores = int(os.environ["SPARK_GRAFT_CPUS"])

    import __spark_entry__ as em
    from uk_ner_presidio_demo_spark.data.synth import (
        ensure_transcripts, sf_key_for_dir,
    )
    from uk_ner_presidio_demo_spark.session import get_spark
    from uk_ner_presidio_demo_spark.sources.tables import read_transcripts

    from pyspark.sql import functions as F

    spark = get_spark(app_name="skew-bench", cores=cores,
                      extra_conf={"spark.ui.enabled": "true"})
    qs = em.queries()
    result: dict = {"metric": "skew_task_walls", "cores": cores, "sfs": {}}

    for sf_dir in SFS:
        key = sf_key_for_dir(sf_dir)
        ensure_transcripts(sf_dir)

        # deterministic bucket-skew: rows per cogroup hash bucket, plus the
        # per-conversation turn skew that causes it
        tr = read_transcripts(spark, sf_dir)
        n_buckets = max(8, spark.sparkContext.defaultParallelism * 2)
        bucket = F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
        brows = (
            tr.groupBy(bucket.alias("b")).count()
            .agg(
                F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("med"),
            ).first()
        )
        conv_rows = (
            tr.groupBy("conv_id").count()
            .agg(
                F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("med"),
            ).first()
        )

        # warm the python workers once so the first measured stage isn't
        # paying interpreter spin-up
        _force(qs["kg_mentions"](spark, sf_dir))

        before = set(_completed_stages(spark))
        _force(qs["kg_triples"](spark, sf_dir))
        triples_stages = _new_heavy_stages(spark, before, min_tasks=8)

        before = set(_completed_stages(spark))
        _force(em._q_top_surfaces(spark, sf_dir))
        plain_stages = _new_heavy_stages(spark, before, min_tasks=8, top=1)

        before = set(_completed_stages(spark))
        _force(qs["kg_top_surfaces_salted"](spark, sf_dir))
        salted_stages = _new_heavy_stages(spark, before, min_tasks=8, top=1)

        # document-side skew (r5): the MinHash band join's shuffle key is
        # (band, bhash) — planted near-dup clusters make some band keys
        # hot; measure the key-level row skew and the join stage's task
        # walls (AQE skew-join splits oversized partitions at runtime)
        from uk_ner_presidio_demo_spark.operators.dedup import _band_rows
        from uk_ner_presidio_demo_spark.sources.tables import read_tpch

        docs = read_tpch(spark, sf_dir, "documents")
        band_rows = (
            _band_rows(docs).groupBy("band", "bhash").count()
            .agg(
                F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("med"),
            ).first()
        )
        before = set(_completed_stages(spark))
        _force(qs["doc_neardup_minhash"](spark, sf_dir))
        neardup_stages = _new_heavy_stages(spark, before, min_tasks=4)

        # PLANTED hot band (the natural corpus's dup clusters are small,
        # band_key_ratio ~3): 300 near-copies of one doc share all their
        # band keys -> one shuffle key holds a ~300-row group whose
        # self-join fans out ~45k candidate pairs.  This is the shape
        # AQE skew-join + the single-eval Jaccard guard exist for; the
        # stage quantiles show what the planted key does to task walls.
        from uk_ner_presidio_demo_spark.operators.dedup import (
            neardup_minhash,
        )

        base = docs.orderBy("doc_id").limit(1).collect()[0]
        hot = spark.createDataFrame(
            [(1_000_000 + i, base["text"] + f" хвіст{i}")
             for i in range(300)],
            "doc_id long, text string",
        )
        spiked = docs.select("doc_id", "text").unionByName(hot)
        spiked_rows = (
            _band_rows(spiked).groupBy("band", "bhash").count()
            .agg(
                F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("med"),
            ).first()
        )
        before = set(_completed_stages(spark))
        _force(neardup_minhash(spiked))
        spiked_stages = _new_heavy_stages(spark, before, min_tasks=4)

        result["sfs"][key] = {
            "band_key_rows_max": band_rows["mx"],
            "band_key_rows_median": band_rows["med"],
            "band_key_ratio": round(band_rows["mx"] / band_rows["med"], 2),
            "neardup_stages": neardup_stages,
            "spiked_band_key_rows_max": spiked_rows["mx"],
            "spiked_band_key_ratio": round(
                spiked_rows["mx"] / spiked_rows["med"], 2),
            "spiked_neardup_stages": spiked_stages,
            "conv_rows_max": conv_rows["mx"],
            "conv_rows_median": conv_rows["med"],
            "triples_bucket_rows_max": brows["mx"],
            "triples_bucket_rows_median": brows["med"],
            "triples_bucket_ratio": round(brows["mx"] / brows["med"], 2),
            "triples_stages": triples_stages,
            "topk_plain_stage": plain_stages,
            "topk_salted_stage": salted_stages,
        }

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
