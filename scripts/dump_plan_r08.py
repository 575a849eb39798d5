"""Dump `explain(formatted)` for named queries to plans/r08/<q>_<tag>.txt
(the optimization round's before/after plan evidence).

Usage: python scripts/dump_plan_r08.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    import __spark_entry__ as em
    from uk_ner_presidio_demo_spark.session import get_spark

    spark = get_spark(cores=int(os.environ["SPARK_GRAFT_CPUS"]))
    qs = dict(em.queries())
    # off-board callables benched under stable names (bench.py qmap)
    qs.setdefault("ann_topk", em._q_ann_topk)
    qs.setdefault("ann_pq_topk", em._q_ann_pq_topk)
    qs.setdefault("doc_pii_scrub", em._q_doc_pii_scrub)
    qs.setdefault("doc_span_excise", em._q_doc_span_excise)
    qs.setdefault("ann_ivfpq_query_path", em._q_ann_ivfpq_query_path)
    qs.setdefault("kg_top_surfaces", em._q_top_surfaces)
    qs.setdefault("events_sessions", em._q_events_sessions)
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r08"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.01")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = out_dir / f"{name}_{tag}.txt"
        p.write_text(plan)
        print(f"wrote {p} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
