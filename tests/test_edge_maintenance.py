"""Standing edge-table maintenance (streaming/edge_maintenance.py):
the foreachBatch fold of a triple stream into versioned edge snapshots.

What must hold:
  * drained stream  ≡  one batch edge_rollup over the full input
    (content equality, and sum(n_obs) conservation);
  * checkpoint resume folds ONLY new files and still converges to the
    batch golden;
  * a REPLAYED batch (the at-least-once failure mode foreachBatch is
    documented with) recomputes byte-identical content — version k is
    derived from the newest version < k, never from itself;
  * a torn previous attempt (leftover _tmp dir, or a published-but-
    uncommitted version) is invisible to readers and cleared by replay;
  * retention prunes old versions but never the newest.
"""

import pandas as pd
import pytest

from uk_ner_presidio_demo_spark.operators.graph import (
    EDGE_KEY, edge_rollup,
)
from uk_ner_presidio_demo_spark.streaming.edge_maintenance import (
    edge_merge_batch_fn, latest_snapshot, read_snapshot,
    run_edge_maintenance, snapshot_versions,
)

SCHEMA = "subj string, pred string, obj string"


def _write_triple_files(path, frames):
    path.mkdir(parents=True, exist_ok=True)
    for k, rows in enumerate(frames):
        pd.DataFrame(rows, columns=EDGE_KEY).astype("string").to_parquet(
            path / f"part-{k}.parquet", index=False
        )


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path))
    )


def _snapshot_pdf(spark, root, vid):
    return (
        spark.read.parquet(str(root / f"v{vid}"))
        .toPandas()
        .sort_values(EDGE_KEY)
        .reset_index(drop=True)
    )


def _batch_golden(spark, src):
    return (
        edge_rollup(spark.read.parquet(str(src)))
        .toPandas()
        .sort_values(EDGE_KEY)
        .reset_index(drop=True)
    )


FRAMES = [
    # file 0: two distinct edges, one repeated triple
    [("a", "knows", "b"), ("a", "knows", "b"), ("b", "works_at", "c")],
    # file 1: one update (a-knows-b again), one insert
    [("a", "knows", "b"), ("c", "located_in", "d")],
    # file 2: carry-only for most, one more insert
    [("e", "knows", "a")],
]


def test_drained_stream_equals_batch_rollup(spark, tmp_path):
    src, root = tmp_path / "src", tmp_path / "snap"
    _write_triple_files(src, FRAMES)
    final = run_edge_maintenance(
        _stream(spark, src), root, str(tmp_path / "ck")
    )
    assert final is not None
    got = _snapshot_pdf(spark, root, final)
    want = _batch_golden(spark, src)
    pd.testing.assert_frame_equal(
        got[EDGE_KEY + ["n_obs"]], want[EDGE_KEY + ["n_obs"]]
    )
    # n_obs conservation: every input triple is counted exactly once
    assert got["n_obs"].sum() == sum(len(f) for f in FRAMES)


def test_checkpoint_resume_folds_only_new_batches(spark, tmp_path):
    src, root, ck = tmp_path / "src", tmp_path / "snap", tmp_path / "ck"
    _write_triple_files(src, FRAMES[:2])
    v1 = run_edge_maintenance(_stream(spark, src), root, str(ck))
    versions_after_first = snapshot_versions(root)

    # new file lands; SAME checkpoint -> only the new batch folds
    pd.DataFrame(FRAMES[2], columns=EDGE_KEY).astype("string").to_parquet(
        src / "part-2.parquet", index=False
    )
    v2 = run_edge_maintenance(_stream(spark, src), root, str(ck))
    assert v2 > v1
    # exactly one new version (one new file = one new micro-batch)
    assert len(snapshot_versions(root)) == len(versions_after_first) + 1
    got = _snapshot_pdf(spark, root, v2)
    want = _batch_golden(spark, src)
    pd.testing.assert_frame_equal(
        got[EDGE_KEY + ["n_obs"]], want[EDGE_KEY + ["n_obs"]]
    )


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """The at-least-once contract: a batch that crashed between sink
    write and checkpoint commit REPLAYS.  Two replay cases: (a) the
    publish completed -> short-circuit, the published version is not
    touched (no vanish window for concurrent readers); (b) the publish
    never happened -> recompute byte-identical content from the newest
    version < k."""
    import shutil

    root = tmp_path / "snap"
    fn = edge_merge_batch_fn(root, keep_versions=10)
    df0 = spark.createDataFrame(FRAMES[0], SCHEMA)
    df1 = spark.createDataFrame(FRAMES[1], SCHEMA)
    fn(df0, 0)
    fn(df1, 1)
    after_first = _snapshot_pdf(spark, root, 1)
    # (a) replay with v1 published: short-circuit — directory untouched
    mtime = (root / "v1").stat().st_mtime_ns
    fn(df1, 1)
    assert (root / "v1").stat().st_mtime_ns == mtime
    pd.testing.assert_frame_equal(after_first, _snapshot_pdf(spark, root, 1))
    # (b) replay after a crash BEFORE publish: v1 gone, recompute from v0
    shutil.rmtree(root / "v1")
    fn(df1, 1)
    after_replay = _snapshot_pdf(spark, root, 1)
    pd.testing.assert_frame_equal(after_first, after_replay)
    assert after_replay["n_obs"].sum() == len(FRAMES[0]) + len(FRAMES[1])
    # v0 untouched by either replay
    assert _snapshot_pdf(spark, root, 0)["n_obs"].sum() == len(FRAMES[0])


def test_stale_root_fails_fast(spark, tmp_path):
    """A fresh checkpoint pointed at a root holding HIGHER-numbered
    versions from a prior run must raise, not silently fork a second
    chain under readers resolving latest_snapshot to the stale data."""
    root = tmp_path / "snap"
    fn = edge_merge_batch_fn(root)
    fn(spark.createDataFrame(FRAMES[0], SCHEMA), 7)
    with pytest.raises(ValueError, match="stale root"):
        fn(spark.createDataFrame(FRAMES[1], SCHEMA), 0)


def test_torn_tmp_is_invisible_and_cleared(spark, tmp_path):
    root = tmp_path / "snap"
    root.mkdir()
    # a torn previous attempt left a tmp dir with garbage
    torn = root / "_tmp_v0"
    torn.mkdir()
    (torn / "part-junk.parquet").write_bytes(b"not parquet")
    assert snapshot_versions(root) == []
    assert latest_snapshot(root) is None

    fn = edge_merge_batch_fn(root)
    fn(spark.createDataFrame(FRAMES[0], SCHEMA), 0)
    assert snapshot_versions(root) == [0]
    assert not torn.exists()
    assert _snapshot_pdf(spark, root, 0)["n_obs"].sum() == len(FRAMES[0])


def test_keep_versions_one_is_rejected(tmp_path):
    """keep_versions=1 would delete the predecessor a replayed batch
    needs (the replay would reset the snapshot to its bare delta) —
    the constructor refuses it."""
    with pytest.raises(ValueError, match="keep_versions"):
        edge_merge_batch_fn(tmp_path / "snap", keep_versions=1)


def test_replay_after_retention_keeps_history(spark, tmp_path):
    """The scenario the >=2 guard protects: publish k, retention runs,
    then k's publish is LOST (crash before rename) and the batch
    replays — the recompute must still find k's predecessor and
    reproduce the full fold, not reset to the bare delta."""
    import shutil

    root = tmp_path / "snap"
    fn = edge_merge_batch_fn(root, keep_versions=2)
    for k, rows in enumerate(FRAMES):
        fn(spark.createDataFrame(rows, SCHEMA), k)
    # retention has pruned v0; newest two survive
    assert snapshot_versions(root) == [1, 2]
    shutil.rmtree(root / "v2")  # crash before v2's publish
    fn(spark.createDataFrame(FRAMES[2], SCHEMA), 2)  # replay last batch
    got = _snapshot_pdf(spark, root, 2)
    assert got["n_obs"].sum() == sum(len(f) for f in FRAMES)


def test_retention_prunes_old_never_newest(spark, tmp_path):
    root = tmp_path / "snap"
    fn = edge_merge_batch_fn(root, keep_versions=2)
    for k, rows in enumerate(FRAMES):
        fn(spark.createDataFrame(rows, SCHEMA), k)
    assert snapshot_versions(root) == [1, 2]
    assert latest_snapshot(root) == 2
    # the kept newest still carries the full fold
    got = _snapshot_pdf(spark, root, 2)
    assert got["n_obs"].sum() == sum(len(f) for f in FRAMES)


def test_stream_snapshot_pagerank_equals_batch(spark, tmp_path):
    """Continuous graph analytics, closed end to end: build the standing
    snapshot FROM THE STREAM, then run PageRank over it — integer ranks
    must be BIT-IDENTICAL to PageRank over a batch rollup of the same
    input (the maintained table is a first-class analytics input, not
    just a sink)."""
    from pyspark.sql import functions as F

    from uk_ner_presidio_demo_spark.operators.graph import pagerank

    src, root = tmp_path / "src", tmp_path / "snap"
    _write_triple_files(src, FRAMES)
    final = run_edge_maintenance(
        _stream(spark, src), root, str(tmp_path / "ck")
    )

    def _edges(df):
        return df.groupBy("subj", "obj").agg(F.sum("n_obs").alias("n_obs"))

    snap = spark.read.parquet(str(root / f"v{final}"))
    batch = edge_rollup(spark.read.parquet(str(src)))
    pr_stream = {
        r.node: r.rank_fp for r in pagerank(_edges(snap), k=4).collect()
    }
    pr_batch = {
        r.node: r.rank_fp for r in pagerank(_edges(batch), k=4).collect()
    }
    assert pr_stream == pr_batch
    assert len(pr_stream) > 0


def test_read_snapshot_time_travel(spark, tmp_path):
    """read_snapshot: newest by default; asof_batch pins the newest
    version <= the id (Iceberg read-at-snapshot-id analog); missing
    versions raise rather than silently reading something else."""
    root = tmp_path / "snap"
    fn = edge_merge_batch_fn(root, keep_versions=10)
    for k, rows in enumerate(FRAMES):
        fn(spark.createDataFrame(rows, SCHEMA), k)

    newest = read_snapshot(spark, root).toPandas()
    assert newest["n_obs"].sum() == sum(len(f) for f in FRAMES)
    asof0 = read_snapshot(spark, root, asof_batch=0).toPandas()
    assert asof0["n_obs"].sum() == len(FRAMES[0])
    # asof between published ids resolves DOWN to the newest <= id
    asof1 = read_snapshot(spark, root, asof_batch=1).toPandas()
    assert asof1["n_obs"].sum() == len(FRAMES[0]) + len(FRAMES[1])
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, tmp_path / "nowhere")
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, asof_batch=-1)


def test_latest_snapshot_before_excludes_self(tmp_path):
    root = tmp_path / "snap"
    for v in (0, 2, 5):
        (root / f"v{v}").mkdir(parents=True)
    assert latest_snapshot(root) == 5
    assert latest_snapshot(root, before=5) == 2
    assert latest_snapshot(root, before=2) == 0
    assert latest_snapshot(root, before=0) is None
