"""Block-max WAND rank-identity vs the exact path (SURVEY.md §7.2-6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.corpus import webpages
from engine.ingest import EARLIEST, as_partitioned_source, run_ingest_loop
from engine.postings import build_posting_blocks, term_freq_with_doclen, term_stats
from engine.query import bm25_topk_from_index, corpus_stats, doc_lengths, search_store
from engine.segments import IndexStore
from engine.wand import search_store_wand, wand_topk

QUERIES = [
    (["table"], 10),            # hot term, many candidates
    (["spark", "vector"], 10),
    (["spark", "table", "merge"], 25),
    (["vector"], 1),
    (["zzz_absent"], 10),
    (["the", "a"], 100),
]


@pytest.fixture(scope="module")
def indexed(spark, docs_mid):
    blocks = build_posting_blocks(
        term_freq_with_doclen(docs_mid), docs_mid.count(), bucket_postings=64
    ).cache()
    stats = corpus_stats(doc_lengths(docs_mid)).collect()[0]
    dfm = {r["term"]: r["df"] for r in term_stats(blocks).collect()}
    return blocks, stats, dfm


@pytest.mark.parametrize("terms,k", QUERIES)
def test_wand_rank_identical_to_exact(spark, indexed, terms, k):
    blocks, stats, dfm = indexed
    exact = bm25_topk_from_index(
        blocks, stats["n_docs"], stats["avgdl"], terms, k=k
    ).collect()
    for num_ranges in (1, 4, 32):
        wand = wand_topk(
            spark, blocks, stats["n_docs"], stats["avgdl"],
            {t: dfm.get(t, 0) for t in terms}, terms, k=k, num_ranges=num_ranges,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in wand] == [
            (r["doc_id"], r["score"]) for r in exact
        ], (terms, num_ranges)


def test_store_wand_auto_strategy(spark, tmp_path):
    """strategy="auto" runs WAND only for few-term queries over long
    posting lists; everything else takes the exact path — identical
    results either way, with the decision recorded in stats_out."""
    from dataclasses import replace

    from engine.config import DEFAULT_CONFIG

    src = as_partitioned_source(webpages(spark, 150, partitions=2), 2)
    store = IndexStore(str(tmp_path), "w").create()
    run_ingest_loop(spark, store, src, rows_per_partition=200, start_option=EARLIEST)
    terms = ["engine", "spark"]
    exact = [(r["doc_id"], r["score"])
             for r in search_store(spark, store, terms, k=10).collect()]

    # tiny store: per-term postings fall below the default threshold -> exact
    out: dict = {}
    got = [(r["doc_id"], r["score"]) for r in search_store_wand(
        spark, store, terms, k=10, strategy="auto", stats_out=out).collect()]
    assert got == exact
    assert out["strategy"] == "exact_auto"
    assert 0 < out["candidate_postings"] \
        < 2 * DEFAULT_CONFIG.wand_auto_min_postings_per_term

    # postings threshold forced to 0: 2-term query -> the WAND scan runs
    out = {}
    cfg0 = replace(DEFAULT_CONFIG, wand_auto_min_postings_per_term=0)
    got = [(r["doc_id"], r["score"]) for r in search_store_wand(
        spark, store, terms, k=10, strategy="auto", cfg=cfg0,
        stats_out=out).collect()]
    assert got == exact
    assert out["strategy"] == "wand_auto"
    assert out["blocks_scored"] >= 0  # the scan actually ran

    # term-count guard: 3-term disjunctions go exact even with long postings
    out = {}
    terms3 = ["engine", "spark", "index"]
    exact3 = [(r["doc_id"], r["score"])
              for r in search_store(spark, store, terms3, k=10).collect()]
    got = [(r["doc_id"], r["score"]) for r in search_store_wand(
        spark, store, terms3, k=10, strategy="auto", cfg=cfg0,
        stats_out=out).collect()]
    assert got == exact3
    assert out["strategy"] == "exact_auto"

    # the held-open reader honors the same choice
    from engine.query import IndexReader

    reader = IndexReader(spark, store)
    out = {}
    got = [(r["doc_id"], r["score"]) for r in reader.search_wand(
        terms, k=10, strategy="auto", stats_out=out).collect()]
    assert got == exact
    assert out["strategy"] == "exact_auto"
    reader.close()

    with pytest.raises(ValueError):
        search_store_wand(spark, store, terms, strategy="best_effort")
    with pytest.raises(ValueError):
        IndexReader(spark, store).search_wand(terms, strategy="best_effort")


def test_store_wand_with_superseded_docs(spark, tmp_path):
    """Multi-segment store with an un-merged upsert: WAND must exclude the
    superseded doc and match the exact multi-segment path."""
    src = as_partitioned_source(webpages(spark, 200, partitions=4), 4)
    store = IndexStore(str(tmp_path), "w").create()
    run_ingest_loop(spark, store, src, rows_per_partition=25, start_option=EARLIEST)
    assert len(store.live_segments()) > 1
    for terms in (["engine", "spark"], ["crawl"], ["index", "rank", "page"]):
        exact = search_store(spark, store, terms, k=15).collect()
        wand = search_store_wand(spark, store, terms, k=15).collect()
        assert [(r["doc_id"], r["score"]) for r in wand] == [
            (r["doc_id"], r["score"]) for r in exact
        ], terms
