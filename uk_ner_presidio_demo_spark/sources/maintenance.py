"""Table maintenance — small-file compaction for partitioned parquet
layouts (the Iceberg `rewrite_data_files` analog; north-rule table
format is Iceberg, whose jar is absent in this sandbox, so maintenance
targets the parquet-layout-equivalent tables `plans/pipeline.py`
materializes).

Why it exists: streaming ingest and per-stage shuffle writes fragment a
partitioned table into many small files (each micro-batch / shuffle
partition contributes one per Hive partition); at 100 TB the resulting
file-listing and task-granularity overheads dominate scan cost long
before data size does.  Compaction rewrites each partition into few
large files without changing a single row.

Safety contract: the rewrite lands in a sibling temp dir first, row
count and schema (names AND types) are verified against the source, and
only then is it published.  The publish is two renames — `src -> .old`,
`tmp -> src` — so there IS a window in which the table path is absent;
a crash there never loses data (it survives at `<path>.old`), and the
next `compact_partitioned_table` call on the same path restores `.old`
before doing anything else.  Concurrent READERS during the window see a
missing path — production would take a lock or use a metadata-pointer
commit (what Iceberg's snapshot swap actually is); for the maintenance
job this repo runs, recovery-on-next-call is the contract (ADVICE r5
#1).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import SparkSession


def _data_files(path: Path) -> list[Path]:
    return [p for p in path.rglob("*.parquet") if p.name != "_SUCCESS"]


def compact_partitioned_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 5_000_000,
) -> dict:
    """Rewrite a `partitionBy(partition_cols)` parquet table so each
    partition holds few large files instead of many small ones.

    Mechanics: one shuffle co-locates each Hive partition onto one task
    (`repartition(partition_cols)`), and the writer's
    `maxRecordsPerFile` re-splits oversized partitions into bounded
    files.  A heavily skewed partition therefore compacts on a single
    task — acceptable for a maintenance job, and the standard trade of
    the one-file-per-partition recipe; schedule compaction off the hot
    path.  Returns {rows, files_before, files_after}.
    """
    src = Path(path)
    tmp = src.with_name(src.name + ".compact_tmp")
    old = src.with_name(src.name + ".old")
    if not src.exists() and old.exists():
        # crash inside a previous publish window (src -> .old done,
        # tmp -> src not): restore the verified previous data first
        shutil.rmtree(tmp, ignore_errors=True)
        old.rename(src)
    df = spark.read.parquet(str(src))
    n_before = df.count()
    files_before = len(_data_files(src))

    shutil.rmtree(tmp, ignore_errors=True)
    (
        df.repartition(*partition_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(str(tmp))
    )

    out = spark.read.parquet(str(tmp))
    n_after = out.count()
    if n_after != n_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {n_before} -> {n_after}; "
            f"source left untouched"
        )
    def _sig(schema):  # names AND types (ADVICE r5 #1)
        return sorted((f.name, f.dataType.simpleString()) for f in schema)

    if _sig(out.schema) != _sig(df.schema):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError("compaction schema mismatch; source untouched")

    # publish: src -> .old, tmp -> src, drop .old
    shutil.rmtree(old, ignore_errors=True)
    src.rename(old)
    tmp.rename(src)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "rows": n_before,
        "files_before": files_before,
        "files_after": len(_data_files(src)),
    }
