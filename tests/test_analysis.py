"""Tokenizer determinism + Spark/Python/DuckDB equivalence (SURVEY.md §5.2-1).

The whole engine depends on the token stream being frozen: Spark (Java
regex), the Python oracle tokenizer, and the DuckDB oracle (RE2) must agree.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from engine.analysis import py_tokenize, tokens, with_extracted_text
from engine.config import TOKEN_PATTERN

SAMPLES = [
    "Hello, World! 123",
    "  multiple   spaces\tand\nnewlines ",
    "MiXeD CaSe TOKENS",
    "héllo wörld ÉCOLE straße",          # accents + sharp s
    "日本語のテキスト and english",        # CJK
    "under_score dash-word dot.word",    # separators: _ - . all split
    "",                                   # empty
    "x",                                  # single token
    "42 3.14 1e9",
    "emoji 😀 mixed",
    None,
]


def test_python_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    got = [r["toks"] for r in df.select(tokens("text").alias("toks")).collect()]
    want = [py_tokenize(s) for s in SAMPLES]
    assert got == want


def test_duckdb_matches_python():
    con = duckdb.connect()
    for s in SAMPLES:
        if s is None:
            continue
        got = con.execute(
            "SELECT regexp_extract_all(lower(?), ?)", [s, TOKEN_PATTERN]
        ).fetchone()[0]
        assert got == py_tokenize(s), s


def test_tokenizer_deterministic_across_partitioning(spark, docs_mid):
    one = (
        docs_mid.repartition(1)
        .select("doc_id", tokens("text").alias("t"))
        .orderBy("doc_id")
        .collect()
    )
    many = (
        docs_mid.repartition(7)
        .select("doc_id", tokens("text").alias("t"))
        .orderBy("doc_id")
        .collect()
    )
    assert one == many


def test_extract_text_roundtrip(spark):
    rows = [
        ("a", "plain ascii text",),
        ("b", "unicode: héllo 日本語 😀",),
        ("c", "",),
    ]
    html = [
        (u, f"<html><head><title>t</title></head><body><p>{t}</p></body></html>".encode())
        for u, t in rows
    ]
    df = spark.createDataFrame(html, "url string, html binary")
    out = {
        r["url"]: (r["extracted_text"], r["extract_error"])
        for r in with_extracted_text(df).collect()
    }
    for u, t in rows:
        assert out[u] == (t, None)


def test_extract_text_quarantines_bad_rows(spark):
    df = spark.createDataFrame(
        [
            ("ok", b"<html><body><p>fine</p></body></html>"),
            ("nop", b"<html><body>no paragraph</body></html>"),
            ("bad", b"<html><body><p>\xff\xfe broken</p></body></html>"),
            ("nul", None),
        ],
        "url string, html binary",
    )
    out = {r["url"]: r["extract_error"] for r in with_extracted_text(df).collect()}
    assert out["ok"] is None
    assert out["nop"] == "no <p> block"
    assert out["bad"].startswith("undecodable")
    assert out["nul"] == "null html"
