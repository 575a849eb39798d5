"""Guards on the repo tooling itself: the bench-regression script must
actually compare queries (VERDICT r2 found it vacuous against the
driver-wrapped BENCH_r*.json format)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "bench_regressions.py"


def _run(old: Path, new: Path) -> tuple[int, str]:
    p = subprocess.run(
        [sys.executable, str(SCRIPT), str(old), str(new)],
        capture_output=True, text=True,
    )
    return p.returncode, p.stdout


def test_reads_driver_wrapped_bench_files():
    """BENCH_r01/r02 are driver-wrapped ({"parsed": {...}}); the guard must
    unwrap them and print the real totals + per-query lines."""
    old, new = REPO / "BENCH_r01.json", REPO / "BENCH_r02.json"
    if not (old.exists() and new.exists()):
        import pytest
        pytest.skip("driver BENCH files not present")
    rc, out = _run(old, new)
    assert rc == 0, out
    assert "33.943" in out and "14.525" in out
    assert "improved" in out  # r1->r2 improved every headline query


def test_flags_a_real_regression(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({
        "parsed": {"value": 1.0, "queries": {"q1": 1.0},
                   "estimator": "best_of_2"},
    }))
    b.write_text(json.dumps({
        "value": 2.0, "queries": {"q1": 2.0}, "estimator": "single_shot",
    }))
    rc, out = _run(a, b)
    assert rc == 1
    assert "REGRESSION q1" in out
    assert "estimator changed" in out


def test_control_normalization_divides_out_host_drift(tmp_path):
    """A uniform 2x slowdown with a matching 2x-slower control probe must
    NOT flag (it's host drift, not code) — and the normalized subtotal
    line must show the drift-corrected number (VERDICT r3 #3)."""
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({
        "value": 1.0, "queries": {"q1": 1.0, "q2": 0.5},
        "estimator": "best_of_2", "control_texts_per_sec": 10000.0,
    }))
    b.write_text(json.dumps({
        "value": 2.0, "queries": {"q1": 2.0, "q2": 1.0, "q3": 0.1},
        "estimator": "best_of_2", "control_texts_per_sec": 5000.0,
    }))
    rc, out = _run(a, b)
    assert rc == 0, out
    assert "REGRESSION" not in out
    assert "hardware control" in out and "normalized" in out


def test_par_control_preferred_over_single_proc(tmp_path):
    """r6: when both files carry the all-cores control leg, normalization
    must use IT — the single-proc leg is blind to busy-host co-tenancy
    (it read FASTER on a 2.4x-slower run of identical code).  Here the
    single-proc leg claims no drift while the all-cores leg shows the
    host at half speed: a uniform 2x wall inflation must NOT flag."""
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({
        "value": 1.5, "queries": {"q1": 1.0, "q2": 0.5},
        "estimator": "best_of_2", "control_texts_per_sec": 10000.0,
        "control_par_texts_per_sec": 200000.0,
    }))
    b.write_text(json.dumps({
        "value": 3.0, "queries": {"q1": 2.0, "q2": 1.0},
        "estimator": "best_of_2", "control_texts_per_sec": 10000.0,
        "control_par_texts_per_sec": 100000.0,
    }))
    rc, out = _run(a, b)
    assert rc == 0, out
    assert "REGRESSION" not in out
    assert "all-cores" in out and "preferred" in out


def test_estimator_note_not_warning_for_prefield_files(tmp_path):
    """A file predating the estimator field must produce a provenance
    NOTE, not a spurious 'estimator changed' warning (VERDICT r3
    What's-wrong #2)."""
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"value": 1.0, "queries": {"q1": 1.0}}))
    b.write_text(json.dumps({
        "value": 1.0, "queries": {"q1": 1.0}, "estimator": "best_of_2",
    }))
    rc, out = _run(a, b)
    assert rc == 0, out
    assert "WARNING" not in out
    assert "pre-estimator-field" in out


def test_headline_count_single_source_of_truth():
    """BENCH/BASELINE.md's stated query count must equal len(bench.HEADLINE)
    (VERDICT r3 #8: one generated number, all documents agree)."""
    import re

    sys.path.insert(0, str(REPO))
    from bench import HEADLINE

    text = (REPO / "BENCH" / "BASELINE.md").read_text()
    m = re.search(r"\*\*(\d+) queries\*\*", text)
    assert m, "BENCH/BASELINE.md lost its generated headline-count line"
    assert int(m.group(1)) == len(HEADLINE)


def test_errors_on_empty_query_dict(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"value": 1.0}))
    b.write_text(json.dumps({"value": 2.0, "queries": {"q1": 2.0}}))
    rc, out = _run(a, b)
    assert rc == 1
    assert "empty query dict" in out


def test_tmpdir_is_per_process_and_reaps_only_dead_pids(tmp_path, monkeypatch):
    """ADVICE r4: a newly-starting process must NOT wipe a live process's
    run dirs (streaming checkpoints!), only roots whose owning pid is
    dead."""
    import importlib
    import os
    import tempfile

    import __spark_entry__ as em

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    base = tmp_path / "spark_graft_runs"
    base.mkdir()
    (base / "pid999999999").mkdir()        # dead pid -> reaped
    (base / f"pid{os.getpid()}").mkdir()   # our own root -> kept
    live = base / "pid1"                   # pid 1 is always alive
    live.mkdir()
    (live / "checkpoint").mkdir()

    monkeypatch.setattr(em, "_TMP_ROOT", None)
    d = em._tmpdir("probe_")
    assert d.startswith(str(base / f"pid{os.getpid()}"))
    assert not (base / "pid999999999").exists()
    assert (live / "checkpoint").exists()  # live sibling untouched


def test_recorded_estimator_seam_downgrades_not_fails(tmp_path):
    """VERDICT r6 #1: the r5->r6 comparison crosses the recorded
    best_of_2 -> best_of_2_passes seam (ESTIMATOR_SEAMS[6]; the r6
    file's own stamp is corrected by ESTIMATOR_ACTUAL).  Flags across a
    RECORDED seam downgrade to informational est-confounded lines and
    exit 0 — the ratios measure the estimator delta, not kernel
    changes."""
    a = tmp_path / "BENCH_r05.json"
    b = tmp_path / "BENCH_r06.json"
    a.write_text(json.dumps({
        "value": 1.0, "queries": {"q1": 1.0}, "estimator": "best_of_2",
    }))
    # r6 file mis-stamped best_of_2 (the actual bug being corrected)
    b.write_text(json.dumps({
        "value": 2.0, "queries": {"q1": 2.0}, "estimator": "best_of_2",
    }))
    rc, out = _run(a, b)
    assert rc == 0, out
    assert "recorded estimator seam" in out
    assert "est-confounded q1" in out
    assert "REGRESSION" not in out


def test_unrecorded_estimator_change_still_fails(tmp_path):
    """An estimator change with NO recorded seam (non-round filenames ->
    no ESTIMATOR_SEAMS key) must keep the original warn-and-fail
    behavior — recording a seam is a deliberate act."""
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({
        "value": 1.0, "queries": {"q1": 1.0}, "estimator": "best_of_2",
    }))
    b.write_text(json.dumps({
        "value": 2.0, "queries": {"q1": 2.0},
        "estimator": "best_of_2_passes",
    }))
    rc, out = _run(a, b)
    assert rc == 1
    assert "REGRESSION q1" in out


def test_live_r5_r6_comparison_is_green():
    """The repo's own r5->r6 seam must stay adjudicated: every flag
    either BY_DESIGN or est-confounded, exit 0 (VERDICT r6 #1 'done'
    criterion)."""
    old, new = REPO / "BENCH_r05.json", REPO / "BENCH_r06.json"
    if not (old.exists() and new.exists()):
        import pytest
        pytest.skip("driver BENCH files not present")
    rc, out = _run(old, new)
    assert rc == 0, out
    assert "by-design  ann_ivfpq_query_path" in out
    assert "by-design  doc_span_excise" in out
    assert "by-design  doc_partial_overlap" in out


def test_parse_byte_conf_suffixes():
    """ADVICE r6: '128m' must parse as 128 MiB, not 128 bytes — the
    JVM byte-string suffix table, case-insensitive, bare digits =
    bytes; unparseable -> None (caller falls back to the default)."""
    from uk_ner_presidio_demo_spark.operators.partitioning import (
        parse_byte_conf,
    )

    assert parse_byte_conf("134217728") == 134217728
    assert parse_byte_conf("128m") == 128 << 20
    assert parse_byte_conf("128MB") == 128 << 20
    assert parse_byte_conf(" 1g ") == 1 << 30
    assert parse_byte_conf("64k") == 64 << 10
    assert parse_byte_conf("2tb") == 2 << 40
    assert parse_byte_conf("7b") == 7
    assert parse_byte_conf("nope") is None
    assert parse_byte_conf("128x") is None
    assert parse_byte_conf("") is None
