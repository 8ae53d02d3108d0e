"""Phrase query (ES match_phrase) semantics: engine/phrase.py.

Covers the positional-join matcher against a brute-force py_tokenize
reference, overlap/repeat/ordering edge cases, the BM25 phrase score
formula, and DuckDB oracle parity on the real sf0.001 corpus.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from engine.analysis import py_tokenize
from engine.config import DEFAULT_CONFIG
from engine.phrase import (
    bm25_phrase_oracle_sql,
    bm25_phrase_topk,
    phrase_freq_oracle_sql,
    phrase_frequencies,
)


def _py_ptf(text: str | None, phrase: list[str]) -> int:
    toks = py_tokenize(text)
    n = len(phrase)
    return sum(
        1
        for i in range(len(toks) - n + 1)
        if toks[i : i + n] == phrase
    )


def _tiny(spark):
    rows = [
        (1, "the quick brown fox jumps over the quick brown dog"),
        (2, "quick brown quick brown quick"),
        (3, "brown quick"),  # reversed order: must NOT match "quick brown"
        (4, "quick"),  # shorter than the phrase
        (5, None),  # null text
        (6, "a a a a"),  # overlapping repeats
        (7, "Quick! Brown?"),  # tokenizer lowercases + strips punctuation
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_freq_matches_bruteforce(spark):
    docs = _tiny(spark)
    rows = {(r["doc_id"], r["ptf"]) for r in
            phrase_frequencies(spark, docs, ["quick", "brown"]).collect()}
    expect = {
        (d, _py_ptf(t, ["quick", "brown"]))
        for d, t in [(1, "the quick brown fox jumps over the quick brown dog"),
                     (2, "quick brown quick brown quick"),
                     (7, "Quick! Brown?")]
    }
    assert rows == expect == {(1, 2), (2, 2), (7, 1)}


def test_phrase_freq_overlapping_repeats(spark):
    docs = _tiny(spark)
    rows = {(r["doc_id"], r["ptf"]) for r in
            phrase_frequencies(spark, docs, ["a", "a"]).collect()}
    # "a a a a" contains "a a" at starts 0,1,2 (overlaps counted)
    assert rows == {(6, 3)}
    rows3 = {(r["doc_id"], r["ptf"]) for r in
             phrase_frequencies(spark, docs, ["a", "a", "a"]).collect()}
    assert rows3 == {(6, 2)}


def test_phrase_order_and_absence(spark):
    docs = _tiny(spark)
    # reversed phrase matches doc 3 only
    rows = {(r["doc_id"], r["ptf"]) for r in
            phrase_frequencies(spark, docs, ["brown", "quick"]).collect()}
    assert rows == {(2, 2), (3, 1)}
    # absent term: no matches at all
    assert phrase_frequencies(spark, docs, ["quick", "zebra"]).count() == 0


def test_single_term_phrase_is_term_frequency(spark):
    docs = _tiny(spark)
    rows = {(r["doc_id"], r["ptf"]) for r in
            phrase_frequencies(spark, docs, ["quick"]).collect()}
    assert rows == {(1, 2), (2, 3), (3, 1), (4, 1), (7, 1)}


def test_bm25_phrase_score_formula(spark):
    """Recompute one score by hand: idf summed per phrase position over
    member-term df, tf := phrase frequency."""
    docs = _tiny(spark)
    phrase = ["quick", "brown"]
    got = {r["doc_id"]: r["score"] for r in
           bm25_phrase_topk(spark, docs, phrase, k=10).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    toks = {d: py_tokenize(t) for d, t in texts.items()}
    n_docs = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = {
        w: sum(1 for v in toks.values() if w in v) for w in set(phrase)
    }
    idf_sum = sum(
        math.log(1 + (n_docs - df[w] + 0.5) / (df[w] + 0.5)) for w in phrase
    )
    cfg = DEFAULT_CONFIG
    expect = {}
    for d, t in texts.items():
        ptf = _py_ptf(t, phrase)
        if ptf == 0:
            continue
        dl = len(toks[d])
        expect[d] = round(
            idf_sum * ptf / (ptf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)), 4
        )
    assert got == expect


@pytest.mark.parametrize("phrase", [["table", "hash"], ["a", "the", "key"]])
def test_oracle_parity_small_corpus(spark, docs_small, phrase):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    s = sorted((r["doc_id"], r["ptf"]) for r in
               phrase_frequencies(spark, docs_small, phrase).collect())
    o = sorted(map(tuple, con.execute(phrase_freq_oracle_sql(phrase)).fetchall()))
    assert s == o
    st = [(r["doc_id"], r["score"]) for r in
          bm25_phrase_topk(spark, docs_small, phrase, k=15).collect()]
    ot = [(d, round(x, 4)) for d, x in
          con.execute(bm25_phrase_oracle_sql(phrase, k=15)).fetchall()]
    assert st == ot
