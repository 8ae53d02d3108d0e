"""simple_query_string parser + compiled bool/phrase semantics
(engine/querystring.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from engine.querystring import (
    Clause,
    parse_simple_query_string,
    simple_query_string_topk,
)


def test_parser_clause_kinds():
    cs = parse_simple_query_string('merge +table -vector "table scan"')
    assert cs == [
        Clause("should", "term", ("merge",)),
        Clause("must", "term", ("table",)),
        Clause("must_not", "term", ("vector",)),
        Clause("should", "phrase", ("table", "scan")),
    ]


def test_parser_default_operator_and():
    cs = parse_simple_query_string("a b -c", default_operator="and")
    assert [c.occur for c in cs] == ["must", "must", "must_not"]


def test_parser_never_throws_and_dedupes():
    # malformed / noise inputs degrade, never raise
    assert parse_simple_query_string("") == []
    assert parse_simple_query_string(None) == []
    assert parse_simple_query_string('|  | ""') == []
    # '+' alone has no analyzable term; duplicate clauses dedupe
    cs = parse_simple_query_string("+ spark spark | spark")
    assert cs == [Clause("should", "term", ("spark",))]
    # a multi-token bare word fans out to per-term clauses, same occur
    cs = parse_simple_query_string("-foo-bar")
    assert cs == [
        Clause("must_not", "term", ("foo",)),
        Clause("must_not", "term", ("bar",)),
    ]
    # quoted phrase with +/- prefix
    cs = parse_simple_query_string('-"a b"')
    assert cs == [Clause("must_not", "phrase", ("a", "b"))]


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_sqs_bool_gating(spark):
    df = _df(
        spark,
        [(1, "table merge extra words"),  # must + should
         (2, "table only here"),          # must only
         (3, "merge no table"),           # wait - contains 'table'!
         (4, "merge alone words"),        # should only -> excluded (must missing)
         (5, "table merge vector"),       # excluded by -vector
         ],
    )
    out = simple_query_string_topk(spark, df, "+table merge -vector", k=10)
    ids = {r.doc_id for r in out.collect()}
    # docs lacking 'table' (4) and containing 'vector' (5) are out;
    # doc 3's text contains the word 'table' so it stays
    assert ids == {1, 2, 3}


def test_sqs_should_only_needs_one_match(spark):
    df = _df(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "beta gamma")])
    out = simple_query_string_topk(spark, df, "alpha gamma", k=10)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 2, 3}


def test_sqs_phrase_must(spark):
    df = _df(
        spark,
        [(1, "full table scan now"), (2, "table then scan apart"),
         (3, "scan table reversed")],
    )
    out = simple_query_string_topk(spark, df, '+"table scan"', k=10)
    ids = [r.doc_id for r in out.collect()]
    assert ids == [1]


def test_sqs_empty_query_returns_empty(spark):
    df = _df(spark, [(1, "anything")])
    assert simple_query_string_topk(spark, df, "", k=5).count() == 0


def test_sqs_pure_negation_is_match_all_minus_excluded(spark):
    # ES bool with only must_not: match_all minus excluded, score 0
    df = _df(spark, [(1, "keep me"), (2, "drop this"), (3, "also keep")])
    out = simple_query_string_topk(spark, df, "-drop", k=5).collect()
    assert [(r.doc_id, r.score) for r in out] == [(1, 0.0), (3, 0.0)]


def test_sqs_store_matches_corpus_path(spark, tmp_path):
    """The store path (pushed posting scans + positions sidecar) must be
    rank-identical to the corpus path for the same query string."""
    from engine.config import IndexConfig
    from engine.corpus import webpages
    from engine.ingest import EARLIEST, as_partitioned_source, run_ingest_loop
    from engine.merge import merge_segments
    from engine.querystring import simple_query_string_store
    from engine.segments import IndexStore

    from engine.querystring import simple_query_string_topk

    cfg = IndexConfig(store_positions=True, store_source=True)
    store = IndexStore(str(tmp_path), "sqsidx", cfg=cfg).create()
    src = as_partitioned_source(webpages(spark, 120, partitions=4), 4)
    run_ingest_loop(spark, store, src, rows_per_partition=15,
                    start_option=EARLIEST, cfg=cfg)
    merge_segments(spark, store, cfg=cfg)

    q = 'engine +index -kafka "search engine"'
    # the stored _source IS the corpus (byte-identical extract invariant),
    # same doc ids, merged stats cover the corpus -> paths must agree
    corpus = store.docs(spark).select("doc_id", F.col("source").alias("text"))
    got = simple_query_string_store(spark, store, q, k=15).collect()
    exp = simple_query_string_topk(spark, corpus, q, k=15).collect()
    assert got and [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_sqs_store_pure_negation_and_no_positions_guard(spark, tmp_path):
    import pytest as _pytest

    from engine.config import IndexConfig
    from engine.corpus import webpages
    from engine.ingest import EARLIEST, as_partitioned_source, run_ingest_loop
    from engine.querystring import simple_query_string_store
    from engine.segments import IndexStore

    cfg = IndexConfig()  # no positions
    store = IndexStore(str(tmp_path), "sqsidx2", cfg=cfg).create()
    src = as_partitioned_source(webpages(spark, 60, partitions=2), 2)
    run_ingest_loop(spark, store, src, rows_per_partition=30,
                    start_option=EARLIEST, cfg=cfg)
    # phrase clause without positions sidecar -> clear error
    with _pytest.raises(ValueError, match="positions sidecar"):
        simple_query_string_store(spark, store, '"a b"', k=5)
    # pure negation: match_all minus excluded at score 0
    out = simple_query_string_store(spark, store, "-engine", k=1000).collect()
    assert out and all(r.score == 0.0 for r in out)
