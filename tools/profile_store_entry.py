"""Profile the `bm25_topk_store` driver-bench entry phase by phase.

Answers VERDICT r03 item #1: where do the ~44s go? Replicates
`__spark_entry__._shared_store` + `_q_bm25_topk_store` exactly (same session
conf as bench.py), but times every sub-phase and counts the Spark jobs each
one launches (job groups + statusTracker), plus surfaces the per-batch
`stage_t` metrics the ingest loop already records.

Usage: python tools/profile_store_entry.py [sf_dir] [cores]
Emits a human table on stderr and ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from engine.session import get_spark

    spark = get_spark("profile-store", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as e
    from engine.config import IndexConfig
    from engine.ingest import as_partitioned_source, ingest_batch, resolve_start_offsets
    from engine.merge import merge_segments
    from engine.segments import IndexStore
    from engine.wand import search_store_wand

    phases: list[dict] = []

    def phase(name: str, fn):
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(name))
        sc.setJobGroup("", "")
        phases.append({"phase": name, "sec": round(dt, 3), "jobs": n_jobs})
        print(f"{name:34s} {dt:8.2f}s  jobs={n_jobs}", file=sys.stderr, flush=True)
        return out

    cfg = IndexConfig(routing_col="lang")
    docs = e._docs(spark, sf_dir)
    n = phase("00_count_docs", docs.count)
    src = as_partitioned_source(
        e._pages_from_documents(docs), num_partitions=4, id_col="row_id"
    )
    root = tempfile.mkdtemp(prefix="profile_store_")
    store = IndexStore(root, "docs_idx", cfg=cfg).create()
    rpp = max(1, math.ceil(n / (4 * 3)))

    batch_metrics = []
    bi = 0
    while True:
        hwm = resolve_start_offsets(store, src)
        res = phase(
            f"1{bi}_ingest_batch{bi}",
            lambda: ingest_batch(spark, store, src, store.next_entry_id(), hwm, rpp, cfg),
        )
        if res is None:
            break
        batch_metrics.append(res.metrics)
        print(f"    stage_t: { {k: v for k, v in res.metrics.items() if k.endswith('_sec')} }",
              file=sys.stderr, flush=True)
        bi += 1

    phase("20_merge", lambda: merge_segments(spark, store, cfg=cfg))
    hits = phase("30_wand_search", lambda: search_store_wand(spark, store, e.FLAGSHIP_TERMS, k=20))

    from pyspark.sql import functions as F

    def final():
        out = (
            hits.withColumnRenamed("doc_id", "store_doc_id")
            .join(F.broadcast(e._store_doc_map(spark, store)), "store_doc_id")
            .select(F.col("orig_doc_id").alias("doc_id"), "score")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )
        return out.count()

    phase("40_final_join_count", final)

    total = sum(p["sec"] for p in phases)
    total_jobs = sum(p["jobs"] for p in phases)
    print(f"{'TOTAL':34s} {total:8.2f}s  jobs={total_jobs}", file=sys.stderr)
    print(json.dumps({
        "metric": "profile_store_entry",
        "sf_dir": sf_dir, "cores": cores,
        "total_sec": round(total, 3), "total_jobs": total_jobs,
        "phases": phases, "batch_stage_t": batch_metrics,
        "load1_post": os.getloadavg()[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
