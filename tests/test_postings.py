"""Posting-block build/decode round-trip + skew-bucketing equivalence
(SURVEY.md §5.2-1/-5) + indexed BM25 == oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from engine.postings import (
    build_posting_blocks,
    decode_postings,
    term_freq_with_doclen,
    term_stats,
)
from engine.query import (
    bm25_topk,
    bm25_topk_from_index,
    bm25_topk_oracle_sql,
    corpus_stats,
    doc_lengths,
)


@pytest.fixture(scope="module")
def tf_dl(docs_mid):
    return term_freq_with_doclen(docs_mid).cache()


@pytest.fixture(scope="module")
def n_docs(docs_mid):
    return docs_mid.count()


def _long_form(df):
    return sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in df.select("term", "doc_id", "tf").collect()
    )


def test_tf_dl_matches_plain_relations(docs_mid, tf_dl):
    from engine.query import term_frequencies

    want = _long_form(term_frequencies(docs_mid))
    assert _long_form(tf_dl) == want
    # dl column equals doc_lengths for every posting
    dl = {r["doc_id"]: r["doc_len"] for r in doc_lengths(docs_mid).collect()}
    bad = [
        r for r in tf_dl.select("doc_id", "dl").distinct().collect()
        if dl[r["doc_id"]] != r["dl"]
    ]
    assert not bad


def test_blocks_roundtrip(tf_dl, n_docs):
    blocks = build_posting_blocks(tf_dl, n_docs)
    assert _long_form(decode_postings(blocks)) == _long_form(tf_dl)


def test_local_builder_equals_relational(docs_mid, tf_dl):
    """The shuffle-free production builder (tokenize+tf+encode per doc-range
    partition, py_tokenize) decodes to exactly the relational tf/dl relation
    (JVM tokenizer) — the frozen-token-stream invariant across both paths,
    at multiple partition counts."""
    from engine.postings import build_posting_blocks_local

    want = _long_form(tf_dl)
    want_dl = sorted(
        (r["term"], r["doc_id"], r["tf"], r["dl"])
        for r in tf_dl.collect()
    )
    for parts in (1, 3, 16):
        blocks = build_posting_blocks_local(docs_mid, num_partitions=parts)
        dec = decode_postings(blocks)
        assert _long_form(dec) == want, parts
        got_dl = sorted(
            (r["term"], r["doc_id"], r["tf"], r["dl"]) for r in dec.collect()
        )
        assert got_dl == want_dl, parts

    # tiny flush threshold: flush boundaries must not change content
    blocks = build_posting_blocks_local(docs_mid, num_partitions=4, flush_docs=7)
    assert _long_form(decode_postings(blocks)) == want


def test_blocks_metadata(tf_dl, n_docs, spark):
    blocks = build_posting_blocks(tf_dl, n_docs).cache()
    bad = blocks.where(
        (F.col("n") <= 0)
        | (F.col("min_doc") > F.col("max_doc"))
        | (F.col("max_tf") <= 0)
        | (F.col("min_dl") <= 0)
    ).count()
    assert bad == 0
    # df from block metadata == df from the long-form relation
    want = {
        (r["term"], r["df"])
        for r in tf_dl.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    got = {(r["term"], r["df"]) for r in term_stats(blocks).collect()}
    assert got == want
    blocks.unpersist()


def test_bucketed_equals_unbucketed(tf_dl, n_docs):
    """Salted (range-bucketed) build == single-group build, and hot terms
    actually fan out into multiple groups."""
    salted = build_posting_blocks(tf_dl, n_docs, bucket_postings=64)
    plain = build_posting_blocks(tf_dl, n_docs, bucket_postings=1 << 40)
    assert _long_form(decode_postings(salted)) == _long_form(decode_postings(plain))
    # the hot term ('table'-like Zipf head) must split into >1 bucket:
    # its block count under bucketing >= ceil(df/64) while unbucketed
    # has ceil(df/128) blocks of exactly 128 except the tail
    hot = (
        term_stats(plain).orderBy(F.col("df").desc()).limit(1).collect()[0]
    )
    n_salted = salted.where(F.col("term") == hot["term"]).count()
    n_plain = plain.where(F.col("term") == hot["term"]).count()
    assert n_salted >= n_plain
    assert n_salted >= hot["df"] // 64


def test_indexed_bm25_matches_oracle(spark, docs_mid, tf_dl, n_docs):
    blocks = build_posting_blocks(tf_dl, n_docs).cache()
    dl = doc_lengths(docs_mid)
    stats = corpus_stats(dl).collect()[0]
    for terms, k, conj in [
        (["spark", "vector", "merge"], 10, False),
        (["table"], 15, False),
        (["spark", "table"], 10, True),
        (["zzz_absent"], 10, False),
    ]:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk_from_index(
                blocks, stats["n_docs"], stats["avgdl"], terms, k=k, conjunctive=conj
            ).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'"
        )
        want = con.execute(bm25_topk_oracle_sql(terms, k=k, conjunctive=conj)).fetchall()
        assert got == [(d, s) for d, s in want], terms
    blocks.unpersist()


def test_indexed_equals_direct(spark, docs_mid, tf_dl, n_docs):
    blocks = build_posting_blocks(tf_dl, n_docs)
    dl = doc_lengths(docs_mid)
    stats = corpus_stats(dl).collect()[0]
    a = bm25_topk_from_index(
        blocks, stats["n_docs"], stats["avgdl"], ["engine", "spark"], k=25
    ).collect()
    b = bm25_topk(spark, docs_mid, ["engine", "spark"], k=25).collect()
    assert a == b
