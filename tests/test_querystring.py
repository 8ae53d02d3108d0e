"""simple_query_string parser + compiled bool/phrase semantics
(engine/querystring.py)."""

from __future__ import annotations

from pyspark.sql import Row

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
