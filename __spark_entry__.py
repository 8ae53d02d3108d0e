"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: PySpark-native inverted-index + BM25 query engine (see engine/),
re-implementing the capabilities of songfj/kafka-elasticsearch-consumer
(the explicit ingest layer) plus the Elasticsearch 5.5 analytics it
delegated (the implicit layer) — SURVEY.md §0.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.config import SCORE_DECIMALS, TOKEN_PATTERN
from engine.query import (
    bm25_topk,
    bm25_topk_from_index,
    bm25_topk_oracle_sql,
    corpus_stats,
    doc_frequencies,
    doc_lengths,
    term_frequencies,
)

FLAGSHIP_TERMS = ["spark", "vector", "merge", "table"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact BM25 top-10 over sf0.001 documents."""
    return bm25_topk(spark, _docs(spark, "/root/testdata/sf0.001"), FLAGSHIP_TERMS, k=10)


# ---------------------------------------------------------------------------
# queries() / oracle_sql() — one entry per implemented operator (SURVEY.md §2)
# ---------------------------------------------------------------------------


def _q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_frequencies(_docs(spark, sf_dir)).select("doc_id", "term", "tf")


def _q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_lengths(_docs(spark, sf_dir))


def _q_doc_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_frequencies(term_frequencies(_docs(spark, sf_dir)))


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats(doc_lengths(_docs(spark, sf_dir))).select(
        "n_docs", F.round("avgdl", SCORE_DECIMALS).alias("avgdl")
    )


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(spark, _docs(spark, sf_dir), FLAGSHIP_TERMS, k=20)


def _q_postings_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build compressed posting blocks, decode back to (term, doc_id, tf).

    The oracle is plain SQL term frequencies, so the driver's value-hash
    directly checks the delta+varint block codec end-to-end."""
    from engine.postings import build_posting_blocks, decode_postings, term_freq_with_doclen

    docs = _docs(spark, sf_dir)
    blocks = build_posting_blocks(term_freq_with_doclen(docs), docs.count())
    return decode_postings(blocks)


def _q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k answered from the compressed index, not the raw corpus."""
    from engine.postings import build_posting_blocks, term_freq_with_doclen

    docs = _docs(spark, sf_dir)
    blocks = build_posting_blocks(term_freq_with_doclen(docs), docs.count())
    dl = doc_lengths(docs)
    stats = corpus_stats(dl).collect()[0]
    return bm25_topk_from_index(
        blocks, dl, stats["n_docs"], stats["avgdl"], FLAGSHIP_TERMS, k=20
    )


def _q_bm25_topk_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(
        spark, _docs(spark, sf_dir), ["spark", "table"], k=20, conjunctive=True
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_frequencies": _q_term_frequencies,
        "doc_lengths": _q_doc_lengths,
        "doc_frequencies": _q_doc_frequencies,
        "corpus_stats": _q_corpus_stats,
        "bm25_topk": _q_bm25_topk,
        "bm25_topk_conjunctive": _q_bm25_topk_conjunctive,
        "postings_roundtrip": _q_postings_roundtrip,
        "bm25_topk_indexed": _q_bm25_topk_indexed,
    }


_TOKS = f"unnest(regexp_extract_all(lower(coalesce(text, '')), '{TOKEN_PATTERN}'))"
_DLEN = f"len(regexp_extract_all(lower(coalesce(text, '')), '{TOKEN_PATTERN}'))"


def oracle_sql() -> dict[str, str]:
    return {
        "term_frequencies": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS term FROM documents)
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        """,
        "doc_lengths": f"SELECT doc_id, {_DLEN} AS doc_len FROM documents",
        "doc_frequencies": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS term FROM documents),
            tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term)
            SELECT term, count(*) AS df FROM tf GROUP BY term
        """,
        "corpus_stats": f"""
            WITH dl AS (SELECT {_DLEN} AS doc_len FROM documents)
            SELECT count(*) AS n_docs, round(avg(doc_len), {SCORE_DECIMALS}) AS avgdl FROM dl
        """,
        "bm25_topk": bm25_topk_oracle_sql(FLAGSHIP_TERMS, k=20),
        "bm25_topk_conjunctive": bm25_topk_oracle_sql(
            ["spark", "table"], k=20, conjunctive=True
        ),
        "postings_roundtrip": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS term FROM documents)
            SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY doc_id, term
        """,
        "bm25_topk_indexed": bm25_topk_oracle_sql(FLAGSHIP_TERMS, k=20),
    }
