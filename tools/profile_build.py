"""Stage-by-stage wall-clock profile of one index-build batch.

Usage: python tools/profile_build.py [n_docs] [cores]
Times each pipeline stage in isolation (materializing with count/write) to
locate the hot spot. Not part of the engine; a diagnosis tool.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:8.2f}s", flush=True)
    return out


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    from engine.session import get_spark

    spark = get_spark("profile", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/engine_bench/corpus_n200000"
    if not os.path.exists(path):
        from engine.corpus import webpages

        path = "/tmp/profile_corpus"
        if not os.path.exists(path + "/_SUCCESS"):
            webpages(spark, n_docs, partitions=32).write.mode("overwrite").parquet(path)

    pages = spark.read.parquet(path).where(F.col("row_id") < n_docs)
    timed("read+count", lambda: pages.count())

    from engine.analysis import tokens, with_extracted_text

    ext = with_extracted_text(pages)
    ext = ext.where(F.col("extract_error").isNull()).drop("extract_error", "html")
    ext = ext.cache()
    timed("extract (pandas UDF) + cache", lambda: ext.count())

    from engine.docids import assign_doc_ids, dedup_last_write_wins

    good = dedup_last_write_wins(ext, "url", "warc_ts")
    docs_w = timed(
        "dedup + doc ids (window)",
        lambda: assign_doc_ids(good, ["url", "warc_ts"]).cache(),
    )
    timed("  materialize window ids", lambda: docs_w.count())
    docs_r = timed(
        "dedup + doc ids (range)",
        lambda: assign_doc_ids(good, ["url", "warc_ts"], strategy="range"),
    )
    timed("  materialize range ids", lambda: docs_r.count())

    docs = docs_w.withColumnRenamed("extracted_text", "text2")

    toks = docs.select("doc_id", F.explode(tokens("text2")).alias("term"))
    timed("explode+count tokens", lambda: toks.count())

    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    timed("tf groupBy", lambda: tf.count())

    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    tf_dl = tf.withColumn("dl", F.sum("tf").over(w).cast("long"))
    tf_dl = tf_dl.cache()
    timed("dl window + cache", lambda: tf_dl.count())

    from engine.postings import build_posting_blocks

    blocks = build_posting_blocks(tf_dl, n_docs)
    timed("encode blocks (applyInPandas)", lambda: blocks.count())

    out = "/tmp/profile_seg"
    shutil.rmtree(out, ignore_errors=True)
    timed(
        "blocks re-encode + sorted write",
        lambda: build_posting_blocks(tf_dl, n_docs)
        .repartitionByRange(F.col("term"))
        .sortWithinPartitions("term", "min_doc")
        .write.mode("overwrite")
        .parquet(out),
    )
    spark.stop()


if __name__ == "__main__":
    main()
