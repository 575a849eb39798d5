"""Pipeline checkpoint/resume tests (SURVEY.md §5.2 item 5) and
materialized-graph sanity."""

import json

import pandas as pd
import pytest

from uk_ner_presidio_demo_spark.oracle.reference_oracle import ensure_golden
from uk_ner_presidio_demo_spark.plans.pipeline import KGPipeline


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("kgrun")
    return str(base / "ckpt"), str(base / "out")


@pytest.fixture(scope="module")
def first_run(spark, sf001, run_dirs):
    ckpt, out = run_dirs
    pipe = KGPipeline(spark=spark, sf_dir=sf001, checkpoint_dir=ckpt,
                      out_dir=out)
    tables = pipe.run()
    return pipe, tables


def test_all_stages_ran(first_run):
    pipe, _ = first_run
    assert all(not r.skipped for r in pipe.results)
    names = [r.stage for r in pipe.results]
    assert names == [
        "validate_metrics", "detected_turns", "mentions", "anonymized",
        "triples", "canonical_nodes", "canonical_triples",
    ]


def test_rerun_skips_everything(spark, sf001, run_dirs, first_run):
    ckpt, out = run_dirs
    pipe2 = KGPipeline(spark=spark, sf_dir=sf001, checkpoint_dir=ckpt,
                       out_dir=out)
    pipe2.run()
    assert all(r.skipped for r in pipe2.results), pipe2.results


def test_partial_resume_after_loss(spark, sf001, run_dirs, first_run):
    """Simulate a crash that lost the last two stages: only they re-run."""
    import shutil
    from pathlib import Path

    ckpt, out = run_dirs
    shutil.rmtree(Path(ckpt) / "canonical_nodes")
    shutil.rmtree(Path(ckpt) / "canonical_triples")
    pipe3 = KGPipeline(spark=spark, sf_dir=sf001, checkpoint_dir=ckpt,
                       out_dir=out)
    pipe3.run()
    status = {r.stage: r.skipped for r in pipe3.results}
    assert status["mentions"] and status["triples"]
    assert not status["canonical_nodes"]
    assert not status["canonical_triples"]


def test_checkpointed_outputs_match_golden(spark, run_dirs, first_run, sf001):
    """Resumed outputs are the same rows the oracle predicts.  Re-read from
    disk: earlier resume tests overwrote the materialized out/ dir, so DFs
    held from the first run have stale file listings."""
    _, out = run_dirs
    gdir = ensure_golden(sf001)
    golden_ct = pd.read_parquet(gdir / "golden_canonical_triples.parquet")
    edges = spark.read.parquet(f"{out}/edges").toPandas()
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    a = edges[keys].sort_values(keys).reset_index(drop=True)
    b = golden_ct[keys].astype(a.dtypes.to_dict()).sort_values(keys) \
        .reset_index(drop=True)
    assert a.equals(b)


def test_manifests_carry_lineage(run_dirs, first_run):
    from pathlib import Path

    ckpt, _ = run_dirs
    man = json.loads((Path(ckpt) / "mentions" / "_MANIFEST.json").read_text())
    assert man["rows"] > 0 and man["input_fingerprint"] and man["partitions"] >= 1


def test_materialized_partition_layout(run_dirs, first_run):
    """Edges land partitioned by pred; nodes by entity_type (the Iceberg
    partitionedBy analogue)."""
    from pathlib import Path

    _, out = run_dirs
    preds = {p.name for p in Path(out, "edges").glob("pred=*")}
    assert {"pred=uses_tool", "pred=mentions_person"} <= preds
    etypes = {p.name for p in Path(out, "nodes").glob("entity_type=*")}
    assert "entity_type=PERS" in etypes


def test_compaction_on_materialized_edges(spark, run_dirs, first_run):
    """Maintenance integration: compacting the pipeline's REAL edges
    table (partitioned by pred) is row-exact and preserves the partition
    layout the scans prune on."""
    from pathlib import Path

    from uk_ner_presidio_demo_spark.sources.maintenance import (
        compact_partitioned_table,
    )

    _, out = run_dirs
    path = f"{out}/edges"
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    before = spark.read.parquet(path).toPandas()[keys] \
        .sort_values(keys).reset_index(drop=True)
    preds_before = {p.name for p in Path(path).glob("pred=*")}
    stats = compact_partitioned_table(spark, path, ["pred"])
    after = spark.read.parquet(path).toPandas()[keys] \
        .sort_values(keys).reset_index(drop=True)
    assert before.equals(after)
    assert stats["files_after"] <= stats["files_before"]
    assert {p.name for p in Path(path).glob("pred=*")} == preds_before
