"""Profile the bm25_topk_store driver entry: wall time + Spark job count
per phase (ingest batches / merge / query), using the status tracker.

Usage: python tools/profile_store.py [sf_dir] [cpus]
Writes one JSON line to stdout; run in a quiet window (check load1 first).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from engine.session import get_spark

    spark = get_spark("profile-store", cores=int(cpus))
    sc = spark.sparkContext

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    from engine.config import IndexConfig
    from engine.ingest import as_partitioned_source, run_ingest_loop
    from engine.merge import merge_segments
    from engine.segments import IndexStore
    from engine.wand import search_store_wand
    from pyspark.sql import functions as F

    def jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    cfg = IndexConfig(routing_col="lang")
    docs = entry._docs(spark, sf_dir)

    t0 = time.monotonic()
    j0 = jobs()
    n = docs.count()
    src = as_partitioned_source(
        entry._pages_from_documents(docs), num_partitions=4, id_col="row_id"
    )
    root = tempfile.mkdtemp(prefix="sparkgraft_prof_")
    store = IndexStore(root, "docs_idx", cfg=cfg).create()
    rpp = max(1, math.ceil(n / (4 * 3)))
    t1 = time.monotonic()
    j1 = jobs()

    results = run_ingest_loop(spark, store, src, rows_per_partition=rpp, cfg=cfg)
    t2 = time.monotonic()
    j2 = jobs()

    merge_segments(spark, store, cfg=cfg)
    t3 = time.monotonic()
    j3 = jobs()

    hits = search_store_wand(spark, store, entry.FLAGSHIP_TERMS, k=20)
    out = (
        hits.withColumnRenamed("doc_id", "store_doc_id")
        .join(F.broadcast(entry._store_doc_map(spark, store)), "store_doc_id")
        .select(F.col("orig_doc_id").alias("doc_id"), "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    rows = out.collect()
    t4 = time.monotonic()
    j4 = jobs()

    batch_metrics = [r.metrics for r in results]
    print(json.dumps({
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "total_sec": round(t4 - t0, 2),
        "phases": {
            "setup": {"sec": round(t1 - t0, 2), "jobs": j1 - j0},
            "ingest": {
                "sec": round(t2 - t1, 2), "jobs": j2 - j1,
                "batches": len(results),
            },
            "merge": {"sec": round(t3 - t2, 2), "jobs": j3 - j2},
            "query": {"sec": round(t4 - t3, 2), "jobs": j4 - j3},
        },
        "rows": len(rows),
        "batch_metrics": batch_metrics,
    }))


if __name__ == "__main__":
    main()
