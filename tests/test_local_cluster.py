"""Cross-JVM parity (VERDICT r4 #2): the KG chain, an ANN query, and
the stateful streaming-triples run
under local-cluster[2,4,2048] — two REAL executor JVMs with their own
Python workers, package shipped via the spark-submit --py-files
equivalent — must be row-identical to plain local mode.

Runs scripts/local_cluster_parity.py as a subprocess because this pytest
process already holds the session-scoped local[N] SparkContext (one JVM
per process), and because a fresh process is exactly how the deployment
being modeled starts."""

import json
import os
import subprocess
import sys


def test_local_cluster_matches_local_mode():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "local_cluster_parity.py")],
        capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["match"] is True
    # non-vacuous: every query produced rows in BOTH modes
    assert all(n > 0 for n in report["counts"].values())
    assert set(report["counts"]) == {
        "kg_mentions", "kg_canonical_nodes", "kg_canonical_triples",
        "ann_ivfpq_topk", "stream_triples",
    }
