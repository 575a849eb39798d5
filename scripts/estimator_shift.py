"""Quantify the best_of_2 -> best_of_2_passes estimator shift ONCE
(VERDICT r6 #1c): how much higher is a pass-separated best-of-2 minimum
than a back-to-back best-of-2 minimum, on queries whose code did NOT
change in r6?

Design — SWEEP-FAITHFUL and interleaved, one session.  The thing the
two estimators differ on is what happens between a query's two
attempts: nothing (back-to-back) vs a full sweep of other queries
(pass-separated, minutes of cache-evicting work).  So the measurement
preserves the sweep structure:

  schedule: P1, S1, S2, P2, S3, S4      (sweeps alternate kinds, so
                                         both estimators sample the
                                         same co-tenant weather)
  * P sweeps (pairs):  for q in SWEEP: run q twice back-to-back;
    the old estimator's sample for q = min of the adjacent pair.
  * S sweeps (passes): for q in SWEEP: run q once; the new
    estimator's sample for q = min over an (S_i, S_j) sweep pair —
    the two attempts are a full sweep apart, like the real bench.

  b2b_estimate(q)  = mean over {P1, P2} of pair-min
  pass_estimate(q) = mean over {min(S1,S2), min(S3,S4)}
  factor(q)        = pass_estimate / b2b_estimate
  headline         = median factor over MEASURED queries

SWEEP includes heavier r6-changed queries purely as cache-evicting
separators (their own factors are NOT reported — a code delta would
contaminate the estimator factor with a real work change); MEASURED is
the untouched-in-r6 subset from the VERDICT r6 adjudication list.

Usage: python scripts/estimator_shift.py 2>/dev/null   (one JSON line)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# untouched-in-r6 queries (VERDICT r6 adjudication list) — the ones
# whose factor is evidence about the ESTIMATOR rather than code
MEASURED = [
    "tpch_agg",
    "tpch_window_topk",
    "txt_freq_profile",
    "events_sessions",
    "doc_hash_sample",
    "kg_top_surfaces",
]
# separators: heavy queries making each sweep minutes-scale and
# cache-evicting, like the real 28-query bench sweep
SEPARATORS = [
    "kg_canonical_nodes",
    "kg_triples",
    "doc_span_excise",
    "doc_contamination",
    "ann_ivfpq_topk",
    "doc_simhash_dups",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from uk_ner_presidio_demo_spark.data.synth import ensure_transcripts
    from uk_ner_presidio_demo_spark.session import get_spark

    ensure_transcripts(sf_dir)
    spark = get_spark(app_name="estimator-shift", cores=cores)

    import bench
    import __spark_entry__ as em

    qmap = dict(em.queries())
    qmap.setdefault("kg_top_surfaces", em._q_top_surfaces)
    qmap.setdefault("events_sessions", em._q_events_sessions)
    qmap.setdefault("doc_span_excise", em._q_doc_span_excise)

    # interleave measured queries between separators so consecutive
    # attempts of a measured query never run adjacent in a pass sweep
    sweep = [q for pair in zip(MEASURED, SEPARATORS) for q in pair]

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # same warm-up discipline as bench.py, plus one full untimed sweep
    # so every query is past first-touch before ANY estimator samples
    force(qmap["kg_mentions"](spark, "/root/testdata/sf0.001"))
    for q in sweep:
        force(qmap[q](spark, sf_dir))

    ctrl_before = bench.control_probe()
    pair_mins: dict[str, list[float]] = {q: [] for q in MEASURED}
    pass_walls: dict[str, list[float]] = {q: [] for q in MEASURED}

    def pairs_sweep():
        for q in sweep:
            t0 = time.time()
            force(qmap[q](spark, sf_dir))
            a1 = time.time() - t0
            t0 = time.time()
            force(qmap[q](spark, sf_dir))
            a2 = time.time() - t0
            if q in pair_mins:
                pair_mins[q].append(min(a1, a2))

    def pass_sweep():
        for q in sweep:
            t0 = time.time()
            force(qmap[q](spark, sf_dir))
            if q in pass_walls:
                pass_walls[q].append(time.time() - t0)

    # P1, S1, S2, P2, S3, S4
    pairs_sweep()
    pass_sweep()
    pass_sweep()
    pairs_sweep()
    pass_sweep()
    pass_sweep()
    ctrl_after = bench.control_probe()

    per_query = {}
    factors = []
    for q in MEASURED:
        b2b_est = statistics.mean(pair_mins[q])
        p = pass_walls[q]
        pass_est = statistics.mean([min(p[0], p[1]), min(p[2], p[3])])
        f = pass_est / b2b_est
        factors.append(f)
        per_query[q] = {
            "b2b_best_mean": round(b2b_est, 3),
            "pass_best_mean": round(pass_est, 3),
            "factor": round(f, 3),
            "pair_mins": [round(x, 3) for x in pair_mins[q]],
            "pass_walls": [round(x, 3) for x in p],
        }

    print(json.dumps({
        "metric": "estimator_shift_b2b_to_passes",
        "median_factor": round(statistics.median(factors), 3),
        "mean_factor": round(statistics.mean(factors), 3),
        "queries": per_query,
        "control_texts_per_sec": [round(ctrl_before, 1),
                                  round(ctrl_after, 1)],
        "sf_dir": sf_dir,
        "cores": cores,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
