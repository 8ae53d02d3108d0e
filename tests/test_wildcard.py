"""Wildcard term queries (engine/wildcard.py — D16): pattern translation,
corpus path, and the store path's leading-literal pushdown + doc-ids-only
decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.ingest import as_partitioned_source, run_ingest_loop
from engine.segments import IndexStore
from engine.wildcard import (
    leading_literal,
    search_store_wildcard,
    wildcard_match,
    wildcard_to_like,
)

TEXTS = [
    "spark scan stream",
    "small slow sort",
    "shark park stark",
    "table chair window",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_pattern_translation():
    assert wildcard_to_like("s?a*") == "s_a%"
    assert wildcard_to_like("a*b?c") == "a%b_c"
    # literal LIKE metacharacters in the user pattern are escaped
    assert wildcard_to_like("50%_x\\y") == "50\\%\\_x\\\\y"
    assert leading_literal("sp*k") == "sp"
    assert leading_literal("?park") == ""
    assert leading_literal("plain") == "plain"


def test_wildcard_match_corpus(spark):
    docs = _docs(spark)
    # s?a* -> any s-term with 'a' as its 3rd char: scan/spark (doc0),
    # small (doc1), shark/stark (doc2)
    got = {r["doc_id"] for r in wildcard_match(spark, docs, "s?a*", k=10).collect()}
    assert got == {0, 1, 2}
    # leading-wildcard pattern
    got2 = {r["doc_id"] for r in wildcard_match(spark, docs, "*ark", k=10).collect()}
    assert got2 == {0, 2}  # spark; shark/park/stark
    # ? is exactly one char
    got3 = {r["doc_id"] for r in wildcard_match(spark, docs, "sor?", k=10).collect()}
    assert got3 == {1}
    assert wildcard_match(spark, docs, "zz*", k=10).count() == 0


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
def wc_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wcstore"))
    store = IndexStore(root, "widx").create()
    src = as_partitioned_source(_pages(spark, TEXTS), num_partitions=2, id_col="row_id")
    run_ingest_loop(spark, store, src, rows_per_partition=2)  # 2 segments
    return store


def test_wildcard_store_matches_corpus(spark, wc_store):
    docs = _docs(spark)
    for pat in ["s?a*", "*ark", "sor?", "zz*"]:
        ref = [(r["doc_id"], r["score"]) for r in
               wildcard_match(spark, docs, pat, k=10).collect()]
        got = [(r["doc_id"], r["score"]) for r in
               search_store_wildcard(spark, wc_store, pat, k=10).collect()]
        assert got == ref, pat


def test_wildcard_store_leading_literal_pushdown(spark, wc_store):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        search_store_wildcard(spark, wc_store, "s?a*", k=10).explain("formatted")
    assert "StartsWith(term,s)" in buf.getvalue()
