"""ES bool-query filters (must_not, minimum_should_match — D14) and fuzzy
term queries (Levenshtein expansion — D15), across the corpus, prebuilt-
index, persisted-store, and held-open-reader paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.fuzzy import fuzzy_expansions, fuzzy_match_topk, search_store_fuzzy
from engine.ingest import as_partitioned_source, run_ingest_loop
from engine.query import IndexReader, bm25_topk, bm25_topk_from_index, search_store
from engine.segments import IndexStore

TEXTS = [
    "spark table merge",        # matches 3 should-terms
    "spark vector",             # 2
    "spark only here",          # 1
    "vector table hash",        # 2 but contains must_not term
    "merge table",              # 2
    "nothing relevant",         # 0
    "hash hash hash",           # 0 + must_not
    "spark merge vector table", # 4
]
SHOULD = ["spark", "vector", "merge", "table"]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# ---------------------------------------------------------------------------
# bool query: corpus path semantics
# ---------------------------------------------------------------------------


def test_min_should_match_counts_distinct_terms(spark):
    docs = _docs(spark)
    assert _ids(bm25_topk(spark, docs, SHOULD, k=10, min_should_match=2)) == {
        0, 1, 3, 4, 7
    }
    assert _ids(bm25_topk(spark, docs, SHOULD, k=10, min_should_match=3)) == {0, 7}
    assert _ids(bm25_topk(spark, docs, SHOULD, k=10, min_should_match=4)) == {7}
    # msm == len(terms) is exactly conjunctive
    assert _rows(bm25_topk(spark, docs, SHOULD, k=10, min_should_match=4)) == _rows(
        bm25_topk(spark, docs, SHOULD, k=10, conjunctive=True)
    )


def test_must_not_excludes_without_rescoring(spark):
    docs = _docs(spark)
    base = dict(_rows(bm25_topk(spark, docs, SHOULD, k=10)))
    got = _rows(bm25_topk(spark, docs, SHOULD, k=10, must_not_terms=["hash"]))
    # doc 3 (contains hash) is gone; every surviving doc keeps its EXACT
    # score (non-scoring filter context: df/stats unaffected)
    assert {d for d, _ in got} == {0, 1, 2, 4, 7}
    for d, s in got:
        assert s == base[d]


def test_bool_combined_msm_and_must_not(spark):
    docs = _docs(spark)
    got = _ids(
        bm25_topk(
            spark, docs, SHOULD, k=10, min_should_match=2, must_not_terms=["hash"]
        )
    )
    assert got == {0, 1, 4, 7}


def test_bool_index_path_matches_corpus(spark):
    from engine.postings import build_posting_blocks_local
    from engine.query import corpus_stats, doc_lengths

    docs = _docs(spark)
    blocks = build_posting_blocks_local(docs)
    st = corpus_stats(doc_lengths(docs)).collect()[0]
    ref = _rows(
        bm25_topk(
            spark, docs, SHOULD, k=10, min_should_match=2, must_not_terms=["hash"]
        )
    )
    got = _rows(
        bm25_topk_from_index(
            blocks, st["n_docs"], st["avgdl"], SHOULD, k=10,
            min_should_match=2, must_not_terms=["hash"],
        )
    )
    assert got == ref


# ---------------------------------------------------------------------------
# store + reader paths (shared tiny store)
# ---------------------------------------------------------------------------


def _pages(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "row_id long, text string")
    return df.select(
        "row_id",
        F.format_string("doc://%012d", F.col("row_id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("row_id")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")), "utf-8").alias(
            "html"
        ),
        F.col("text"),
        F.lit("en").alias("lang"),
    )


@pytest.fixture(scope="module")
def bool_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("boolstore"))
    store = IndexStore(root, "bidx").create()
    src = as_partitioned_source(_pages(spark, TEXTS), num_partitions=2, id_col="row_id")
    run_ingest_loop(spark, store, src, rows_per_partition=4)
    return store


def test_bool_store_and_reader_match_corpus(spark, bool_store):
    docs = _docs(spark)
    ref = _rows(
        bm25_topk(
            spark, docs, SHOULD, k=10, min_should_match=2, must_not_terms=["hash"]
        )
    )
    got_store = _rows(
        search_store(
            spark, bool_store, SHOULD, k=10,
            min_should_match=2, must_not_terms=["hash"],
        )
    )
    assert got_store == ref
    reader = IndexReader(spark, bool_store)
    try:
        got_reader = _rows(
            reader.search(
                SHOULD, k=10, min_should_match=2, must_not_terms=["hash"]
            )
        )
        assert got_reader == ref
    finally:
        reader.close()


# ---------------------------------------------------------------------------
# fuzzy expansion + fuzzy search
# ---------------------------------------------------------------------------

FUZZ_TEXTS = [
    "spark sparks spars",   # near-neighbors of "spark"
    "shark spark park",
    "spork stark sparkle",
    "table chair",
]


def test_fuzzy_expansions_distance_and_cap(spark):
    vocab = (
        _docs(spark, FUZZ_TEXTS)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    # distance 1 from "spark": spark(0) + single-edit neighbors
    e1 = fuzzy_expansions(vocab, "spark", max_edits=1)
    assert e1 == ["spark", "park", "shark", "sparks", "spars", "spork", "stark"]
    # deterministic (distance ASC, term ASC) truncation
    assert fuzzy_expansions(vocab, "spark", max_edits=1, max_expansions=3) == [
        "spark", "park", "shark"
    ]
    # prefix_length pins the leading chars exactly
    assert fuzzy_expansions(vocab, "spark", max_edits=1, prefix_length=2) == [
        "spark", "sparks", "spars", "spork"
    ]
    # max_edits=0: the exact term only
    assert fuzzy_expansions(vocab, "spark", max_edits=0) == ["spark"]
    assert fuzzy_expansions(vocab, "zzzz", max_edits=1) == []


def test_fuzzy_match_is_bm25_over_expansion(spark):
    docs = _docs(spark, FUZZ_TEXTS)
    got = _rows(fuzzy_match_topk(spark, docs, "spark", k=10, max_edits=1))
    ref = _rows(
        bm25_topk(
            spark, docs,
            ["spark", "park", "shark", "sparks", "spars", "spork", "stark"],
            k=10,
        )
    )
    assert got == ref and len(got) == 3


def test_fuzzy_no_match_returns_empty_hits(spark):
    docs = _docs(spark, FUZZ_TEXTS)
    out = fuzzy_match_topk(spark, docs, "qqqqqq", k=10, max_edits=1)
    assert out.columns == ["doc_id", "score"] and out.count() == 0


@pytest.fixture(scope="module")
def fuzz_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fuzzstore"))
    store = IndexStore(root, "fidx").create()
    src = as_partitioned_source(
        _pages(spark, FUZZ_TEXTS), num_partitions=2, id_col="row_id"
    )
    run_ingest_loop(spark, store, src, rows_per_partition=4)
    return store


def test_fuzzy_store_and_reader_match_corpus(spark, fuzz_store):
    docs = _docs(spark, FUZZ_TEXTS)
    ref = _rows(fuzzy_match_topk(spark, docs, "spark", k=10, max_edits=1))
    got_store = _rows(
        search_store_fuzzy(spark, fuzz_store, "spark", k=10, max_edits=1)
    )
    assert got_store == ref
    reader = IndexReader(spark, fuzz_store)
    try:
        got_reader = _rows(reader.search_fuzzy("spark", k=10, max_edits=1))
        assert got_reader == ref
        # no-match through the reader: empty, right schema
        empty = reader.search_fuzzy("qqqqqq", k=10, max_edits=1)
        assert empty.columns == ["doc_id", "score"] and empty.count() == 0
    finally:
        reader.close()
