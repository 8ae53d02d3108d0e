"""Two-parallelism scaling bench -> BENCH/BASELINE.md (north-rule evidence).

The north rule requires >=0.8 throughput scaling efficiency between two
cluster sizes (N and 4N executors). This sandbox has one machine, so the
evidence is the same job at local[8] vs local[32] on IDENTICAL input
(BASELINE.md §2): each parallelism level runs in its own subprocess (one
JVM per master setting), builds the full inverted index over the same
deterministic corpus, and reports docs/sec. Query latency (p50/p99, exact
vs WAND) is measured at the high level.

Usage:
    python bench/scaling.py [--docs 200000] [--out BENCH/BASELINE.md]
    python bench/scaling.py --child --cores 8 --docs ...   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/tmp/engine_bench/corpus"
QUERY_SET = [
    (["engine"], 10),            # hot term (~90% df)
    (["spark"], 10),
    (["crawl", "rank"], 10),
    (["index", "page", "score"], 10),
    (["batch", "offset"], 100),
    (["token"], 1),
    (["merge", "shard"], 10),
    (["query", "commit"], 10),
    (["zzznope"], 10),           # absent term
    (["engine", "spark", "index", "rank"], 10),
]


def ensure_corpus(n_docs: int) -> str:
    """Materialize the deterministic corpus once; both levels read it."""
    path = f"{CORPUS_DIR}_n{n_docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from engine.corpus import webpages
    from engine.session import get_spark

    spark = get_spark("bench-corpus", cores=32)
    webpages(spark, n_docs, partitions=64).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


SOURCE_PARTITIONS = 64  # fixed across parallelism levels: SAME job, same batching


def child(cores: int, n_docs: int) -> None:
    """One parallelism level: full index build + query latency. Prints JSON."""
    import shutil

    from pyspark.sql import functions as F

    from engine.config import IndexConfig
    from engine.ingest import EARLIEST, as_partitioned_source, run_ingest_loop
    from engine.query import search_store
    from engine.segments import IndexStore
    from engine.session import get_spark
    from engine.wand import search_store_wand

    # the box has 128 GiB; in local mode the driver JVM hosts every executor
    # thread, so size the heap for the thread count, not for "a driver"
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(f"bench-c{cores}", cores=cores, shuffle_partitions=cores * 2)
    corpus = spark.read.parquet(ensure_corpus(n_docs))
    source = as_partitioned_source(corpus, num_partitions=SOURCE_PARTITIONS)

    root = f"/tmp/engine_bench/idx_c{cores}"
    shutil.rmtree(root, ignore_errors=True)
    store = IndexStore(root, "bench").create()

    t0 = time.perf_counter()
    results = run_ingest_loop(
        spark, store, source,
        # 2 batches, double ceil so no tiny leftover third micro-batch
        rows_per_partition=max(1, -(-(-(-n_docs // SOURCE_PARTITIONS)) // 2)),
        start_option=EARLIEST,
        cfg=IndexConfig(docid_strategy="range"),  # parallel ids (same as window)
    )
    build_sec = time.perf_counter() - t0
    total_docs = sum(r.n_docs for r in results)

    # query latency at this level: a held-open IndexReader (the Lucene
    # searcher split — index cached once, queries only filter+decode+score)
    from engine.query import IndexReader

    reader = IndexReader(spark, store)
    reader.search(["warmup"], k=1).collect()  # warm-up outside the timing loop
    lat_exact, lat_wand = [], []
    for terms, k in QUERY_SET:
        t = time.perf_counter()
        reader.search(terms, k=k).collect()
        lat_exact.append(time.perf_counter() - t)
        t = time.perf_counter()
        reader.search_wand(terms, k=k).collect()
        lat_wand.append(time.perf_counter() - t)

    def pct(xs, p):
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(round(p * (len(xs) - 1))))]

    print(json.dumps({
        "cores": cores,
        "n_docs": total_docs,
        "n_batches": len(results),
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(total_docs / build_sec, 1),
        "q_exact_p50_ms": round(statistics.median(lat_exact) * 1000, 1),
        "q_exact_p99_ms": round(pct(lat_exact, 0.99) * 1000, 1),
        "q_wand_p50_ms": round(statistics.median(lat_wand) * 1000, 1),
        "q_wand_p99_ms": round(pct(lat_wand, 0.99) * 1000, 1),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    if args.child:
        child(args.cores, args.docs)
        return

    ensure_corpus(args.docs)
    reports = {}
    for cores in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", "--cores", str(cores), "--docs", str(args.docs)],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        reports[cores] = json.loads(line)
        print(f"cores={cores}: {reports[cores]}", file=sys.stderr)

    r8, r32 = reports[8], reports[32]
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH — index build + query latency, two parallelism levels

North-rule evidence (BASELINE.json): same job, same input, `local[8]` vs
`local[32]` (the sandbox stand-in for N vs 4N executors). Corpus:
{args.docs:,} deterministic Common-Crawl-style pages (engine/corpus.py),
full pipeline: extract -> tokenize -> dedup -> doc-ids -> posting blocks
(delta+varint, block-max impacts) -> segment commit + ledger.

| metric | local[8] | local[32] |
|---|---|---|
| index build docs/sec | {r8['docs_per_sec']:,} | {r32['docs_per_sec']:,} |
| build wall sec | {r8['build_sec']} | {r32['build_sec']} |
| query p50 ms (exact) | {r8['q_exact_p50_ms']} | {r32['q_exact_p50_ms']} |
| query p99 ms (exact) | {r8['q_exact_p99_ms']} | {r32['q_exact_p99_ms']} |
| query p50 ms (WAND) | {r8['q_wand_p50_ms']} | {r32['q_wand_p50_ms']} |
| query p99 ms (WAND) | {r8['q_wand_p99_ms']} | {r32['q_wand_p99_ms']} |

**Throughput scaling efficiency (8 -> 32 cores, strong scaling):**
`(docs_per_sec_32 / docs_per_sec_8) / 4 = {eff:.3f}` (target >= 0.8 is for
weak scaling N->4N executors on a real cluster; strong scaling on one box
shares one JVM, memory bus and driver, so it is the harsher test).

Raw: `{json.dumps(reports)}`
""")
    print(json.dumps({"efficiency": round(eff, 3), **{f"c{c}": r for c, r in reports.items()}}))


if __name__ == "__main__":
    main()
