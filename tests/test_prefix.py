"""Prefix query (ES `prefix`, constant-score) semantics: engine/prefix.py."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from engine.analysis import py_tokenize
from engine.config import IndexConfig
from engine.ingest import as_partitioned_source, run_ingest_loop
from engine.merge import merge_segments
from engine.prefix import prefix_match, prefix_oracle_sql, search_store_prefix
from engine.segments import IndexStore

TEXTS = [
    "spark sorts tables",        # matches s*
    "nothing to see",            # s: "see" matches; sm: no
    "plain words only",          # no s-words
    "small smart samples",       # matches s*/sm*
    "SORT is uppercase here",    # tokenizer lowercases -> matches
    "the quick brown fox",       # no s-words
]


def _docs_frame(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _brute(prefix):
    return sorted(
        i for i, t in enumerate(TEXTS)
        if any(w.startswith(prefix) for w in py_tokenize(t))
    )


def test_prefix_match_bruteforce(spark):
    docs = _docs_frame(spark)
    for p, k in [("s", 10), ("sm", 10), ("zz", 10), ("sort", 10)]:
        got = [(r["doc_id"], r["score"]) for r in
               prefix_match(spark, docs, p, k=k).collect()]
        assert got == [(i, 1.0) for i in _brute(p)[:k]], p


def test_prefix_match_k_limit(spark):
    docs = _docs_frame(spark)
    got = [r["doc_id"] for r in prefix_match(spark, docs, "s", k=2).collect()]
    assert got == _brute("s")[:2]


def test_prefix_oracle_parity(spark, docs_small):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for p in ["s", "ta", "zzz"]:
        got = [(r["doc_id"], r["score"]) for r in
               prefix_match(spark, docs_small, p, k=25).collect()]
        ora = list(map(tuple, con.execute(prefix_oracle_sql(p, k=25)).fetchall()))
        assert got == ora, p


def _pages(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "row_id long, text string")
    return df.select(
        "row_id",
        F.format_string("doc://%012d", F.col("row_id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("row_id")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")), "utf-8").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )


def test_store_prefix_matches_corpus_path(spark, tmp_path):
    cfg = IndexConfig()
    store = IndexStore(str(tmp_path), "pfx", cfg=cfg).create()
    src = as_partitioned_source(_pages(spark, TEXTS), num_partitions=2, id_col="row_id")
    run_ingest_loop(spark, store, src, rows_per_partition=2, cfg=cfg)
    for p in ["s", "sm", "zz"]:
        got = [r["doc_id"] for r in
               search_store_prefix(spark, store, p, k=10).collect()]
        assert got == _brute(p)[:10], p
    # unordered k=None returns the full match set
    assert {r["doc_id"] for r in
            search_store_prefix(spark, store, "s", k=None).collect()} == set(_brute("s"))
    merge_segments(spark, store, cfg=cfg)
    got = [r["doc_id"] for r in search_store_prefix(spark, store, "s", k=10).collect()]
    assert got == _brute("s")[:10]
