"""Golden check: exact BM25 top-k (Spark) == DuckDB oracle, rank-identical.

This is the §7.2-step-2 end-to-end slice: read docs -> tokenize -> tf/df/
doc_len -> BM25 -> top-k, all stock DataFrame ops, checked against an
independent SQL engine running the same math.
"""

from __future__ import annotations

import duckdb
import pytest

from engine.query import bm25_topk, bm25_topk_oracle_sql

QUERIES = [
    (["spark", "vector", "merge"], 10, False),
    (["table"], 10, False),            # hot term
    (["vector"], 5, False),            # rarer term
    (["spark", "table"], 100, False),
    (["spark", "table"], 10, True),    # conjunctive
    (["zzzznotaterm"], 10, False),     # absent term -> empty
    (["the", "a", "spark"], 1, False), # k=1, stopword-ish hot terms
]


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


@pytest.mark.parametrize("terms,k,conj", QUERIES)
def test_bm25_topk_matches_oracle(spark, docs_mid, terms, k, conj):
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(spark, docs_mid, terms, k=k, conjunctive=conj).collect()
    ]
    want = _duck(
        "/root/testdata/sf0.01", bm25_topk_oracle_sql(terms, k=k, conjunctive=conj)
    )
    assert got == [(d, s) for d, s in want]


def test_bm25_deterministic_across_parallelism(spark, docs_mid):
    a = bm25_topk(spark, docs_mid.repartition(2), ["spark", "table"], k=20).collect()
    b = bm25_topk(spark, docs_mid.repartition(16), ["spark", "table"], k=20).collect()
    assert a == b
