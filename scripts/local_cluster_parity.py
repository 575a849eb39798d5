"""Cross-JVM parity check (VERDICT r4 #2): run the KG chain
(kg_mentions -> kg_canonical_nodes -> kg_canonical_triples) and one ANN
query (ann_ivfpq_topk — the k-means/PQ matrices ride in kernel closures)
on a REAL multi-process master, local-cluster[2,4,2048], and assert the
results are row-identical to plain local mode.  Since r5 the list also
includes stream_triples — a REAL Structured Streaming availableNow run
whose GroupState lives in per-executor state stores, proving the
stateful streaming operator survives the multi-JVM topology too.

Why this matters: everything else in the repo runs under local[N], where
broadcasts and UDF closures never cross a process boundary — so
closure-serialization and broadcast-size assumptions were untested.
local-cluster spawns two separate executor JVMs (each with its own
Python workers); every Arrow kernel, frozen-centroid closure, and
broadcast join in these queries must survive real serialization.

The cluster session ships the package to executors the way a real
deployment does — `spark.submit.pyFiles dist/kg.zip`, the programmatic
equivalent of `spark-submit --py-files dist/kg.zip` (README/SCALE.md §6)
— because local-cluster executor Python workers have their own sys.path:
without the zip every kernel closure dies with ModuleNotFoundError
(observed), which is exactly the deployment gap this check exists to
catch.

Invoked by tests/test_local_cluster.py as a subprocess (the pytest
session already holds a local[N] SparkContext; one JVM per process).
Prints one JSON line {"match": bool, "counts": {...}} and exits 0 on
parity.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
# stream_triples exercises applyInPandasWithState cross-JVM: GroupState
# lives in per-executor state stores, the EOS-marker availableNow run
# must still converge to the exact batch triples in BOTH topologies
QUERIES = ["kg_mentions", "kg_canonical_nodes", "kg_canonical_triples",
           "ann_ivfpq_topk", "stream_triples"]


def _fingerprint(df) -> tuple[int, str]:
    """(row_count, order-independent sha256 over sorted row reprs).
    repr() keeps full double precision; column order is schema order,
    which is identical across the two runs by construction."""
    rows = sorted(repr(tuple(r)) for r in df.collect())
    h = hashlib.sha256("\n".join(rows).encode("utf-8")).hexdigest()
    return len(rows), h


def _run_all(master: str) -> dict[str, tuple[int, str]]:
    import pyspark
    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    b = (
        SparkSession.builder.master(master)
        .appName(f"parity-{master}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "4g"))
    )
    if master.startswith("local-cluster"):
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            ["bash", os.path.join(repo, "scripts", "make_pyfiles.sh")],
            check=True, capture_output=True,
        )
        b = (
            b.config("spark.executor.memory", "2g")
            # the spark-submit --py-files path: executors get the package
            # on their python worker sys.path via the shipped zip
            .config("spark.submit.pyFiles",
                    os.path.join(repo, "dist", "kg.zip"))
        )
    spark = b.getOrCreate()
    try:
        import __spark_entry__ as em

        q = em.queries()
        out = {}
        for name in QUERIES:
            out[name] = _fingerprint(q[name](spark, SF_DIR))
        return out
    finally:
        spark.stop()


def main() -> int:
    # local-cluster FIRST (the risky mode), then the local reference —
    # sequential sessions in one process (one JVM at a time)
    cluster = _run_all("local-cluster[2,4,2048]")
    local = _run_all("local[4]")
    match = cluster == local
    print(json.dumps({
        "match": match,
        "counts": {k: cluster[k][0] for k in QUERIES},
        "cluster": {k: cluster[k][1][:16] for k in QUERIES},
        "local": {k: local[k][1][:16] for k in QUERIES},
    }))
    return 0 if match else 1


if __name__ == "__main__":
    sys.exit(main())
