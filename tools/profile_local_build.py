"""Isolate per-stage scaling: extract pass, local block build, segment write.

Usage: python tools/profile_local_build.py <cores> [n_docs]
Prints one line per stage. Run at 8 and 32 to compare.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"STAGE {label:32s} {dt:8.2f}s", flush=True)


def main():
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from engine.session import get_spark

    spark = get_spark(f"plb-{cores}", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet("/tmp/engine_bench/corpus_n200000").where(
        F.col("row_id") < n_docs
    )

    from engine.analysis import with_extracted_text
    from engine.docids import assign_doc_ids, dedup_last_write_wins
    from engine.postings import build_posting_blocks_local

    ext = with_extracted_text(pages).where(F.col("extract_error").isNull()).cache()
    timed("extract+cache", lambda: ext.count())

    good = dedup_last_write_wins(ext, "url", "warc_ts")
    ided_w = assign_doc_ids(good, ["url", "warc_ts"]).cache()
    timed("ids window + cache", lambda: ided_w.count())
    ided_r = assign_doc_ids(good, ["url", "warc_ts"], strategy="range").cache()
    timed("ids range + cache", lambda: ided_r.count())

    blocks = build_posting_blocks_local(ided_r, text_col="extracted_text")
    timed("local build (count)", lambda: blocks.count())

    out = f"/tmp/plb_seg_{cores}"
    shutil.rmtree(out, ignore_errors=True)
    timed(
        "local build -> sorted write",
        lambda: build_posting_blocks_local(ided_r, text_col="extracted_text")
        .repartitionByRange(F.col("term"), F.col("min_doc"))
        .sortWithinPartitions("term", "min_doc")
        .write.mode("overwrite")
        .parquet(out),
    )
    spark.stop()


if __name__ == "__main__":
    main()
