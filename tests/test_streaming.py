"""Structured Streaming ingest twin: drain, resume, incremental files.

Mirrors the batch-loop recovery tests (reference S1/S2/S3 semantics) on the
readStream path: every micro-batch commits one segment, a restarted stream
with the same checkpoint processes nothing twice, and newly-arrived files
are picked up incrementally.
"""

import os

import pytest
from pyspark.sql import functions as F

from engine.corpus import webpages
from engine.query import bm25_topk, search_store
from engine.segments import IndexStore
from engine.streaming import stream_ingest

N_DOCS = 120


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    pages = webpages(spark, N_DOCS).cache()
    # two initial files -> two availableNow micro-batches at maxFilesPerTrigger=1
    pages.where(F.col("row_id") < 50).coalesce(1).write.mode("append").parquet(d)
    pages.where((F.col("row_id") >= 50) & (F.col("row_id") < 100)).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    pages.unpersist()
    return d


def test_stream_ingest_drain_resume_incremental(spark, tmp_path, source_dir):
    root = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    store = IndexStore(root, "stream").create()

    results = []
    stream_ingest(spark, store, source_dir, ckpt, results=results)
    # 100 pages minus quarantine row 3, minus row 4 (superseded by its dup
    # row 5 inside the same micro-batch, last-write-wins D10)
    assert sum(r.n_docs for r in results) == 98
    n_segs = len(store.live_segments())
    assert n_segs >= 2  # one segment per micro-batch
    assert store.global_stats()["n_docs"] == 98

    # resume with same checkpoint: nothing new -> no new segments
    results2 = []
    stream_ingest(spark, store, source_dir, ckpt, results=results2)
    assert results2 == []
    assert len(store.live_segments()) == n_segs

    # late-arriving file -> exactly the new rows are ingested
    webpages(spark, N_DOCS).where(F.col("row_id") >= 100).coalesce(1).write.mode(
        "append"
    ).parquet(source_dir)
    results3 = []
    stream_ingest(spark, store, source_dir, ckpt, results=results3)
    assert sum(r.n_docs for r in results3) == 20
    assert store.global_stats()["n_docs"] == 118

    # the streamed index answers identically to the one-shot exact path
    # (scores use the same global stats because every doc landed exactly once)
    corpus = webpages(spark, N_DOCS)
    from engine.analysis import with_extracted_text

    good = (
        with_extracted_text(corpus)
        .where(F.col("extract_error").isNull())
        .select("row_id", F.col("extracted_text").alias("text"), "url", "warc_ts")
    )
    from engine.docids import assign_doc_ids, dedup_last_write_wins

    docs = assign_doc_ids(dedup_last_write_wins(good), ["url", "warc_ts"])
    expected = {
        (r["score"],)
        for r in bm25_topk(spark, docs, ["engine", "spark"], k=10).collect()
    }
    got = {
        (r["score"],)
        for r in search_store(spark, store, ["engine", "spark"], k=10).collect()
    }
    assert got == expected
