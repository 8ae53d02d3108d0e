"""Bucket aggregations part 2 (engine/aggs_bucket.py): top_hits, composite,
range, filters.

Oracle-parity via each op's own *_oracle_sql builder on the same parquet,
plus the semantics that matter: composite pagination covers the whole
bucket space disjointly, range overlap counts a doc in every matching
bucket, top_hits plans with a map-side (Partial) WindowGroupLimit, and
filters evaluates all predicates in one job.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

RANGES = [("short", None, 200), ("medium", 200, 400),
          ("long", 400, None), ("broad", 150, 450)]


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def _norm(rows):
    return sorted(tuple(repr(v) for v in r) for r in rows)


def test_top_hits_matches_oracle(spark, docs_small):
    from engine.aggs_bucket import top_hits_agg, top_hits_oracle_sql

    got = [tuple(r) for r in
           top_hits_agg(docs_small, "lang", "n_chars", 4, 3).collect()]
    want = _duck(SF_SMOKE, top_hits_oracle_sql("lang", "n_chars", 4, 3))
    assert _norm(got) == _norm(want)
    # exactly n_hits per surviving bucket (fixture buckets are big enough)
    per_bucket = {}
    for key, _cnt, rank, _id, _sc in got:
        per_bucket.setdefault(key, []).append(rank)
    assert len(per_bucket) == 4
    assert all(sorted(v) == [1, 2, 3] for v in per_bucket.values())


def test_top_hits_plans_partial_window_group_limit(spark, docs_small):
    from engine.aggs_bucket import top_hits_agg

    plan = (
        top_hits_agg(docs_small, "lang", "n_chars", 4, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the map-side partial top-k is the 100 TB hot-bucket defense
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_composite_pages_cover_bucket_space(spark, docs_small):
    from engine.aggs_bucket import composite_agg, composite_oracle_sql

    sources, size = ["lang", "source"], 7
    all_buckets = _norm(_duck(
        SF_SMOKE,
        f"SELECT lang, source, count(*) AS doc_count FROM documents "
        f"GROUP BY 1, 2",
    ))
    pages, after, n_pages = [], None, 0
    while True:
        page = [tuple(r) for r in
                composite_agg(docs_small, sources, size, after).collect()]
        if not page:
            break
        # page-level oracle parity (including the after-key predicate)
        want = _duck(SF_SMOKE, composite_oracle_sql(sources, size, after))
        assert _norm(page) == _norm(want)
        # key-ordered within the page
        keys = [(r[0], r[1]) for r in page]
        assert keys == sorted(keys)
        pages.extend(page)
        after = keys[-1]
        n_pages += 1
        assert n_pages < 100
    # pagination is disjoint and complete
    assert len(pages) == len(set((r[0], r[1]) for r in pages))
    assert _norm(pages) == all_buckets


def test_range_agg_overlap_and_empty_buckets(spark, docs_small):
    from engine.aggs_bucket import range_agg, range_agg_oracle_sql

    got = [tuple(r) for r in
           range_agg(docs_small, "n_chars", RANGES, "n_chars").collect()]
    want = _duck(SF_SMOKE,
                 range_agg_oracle_sql("n_chars", RANGES, "n_chars"))
    assert _norm(got) == _norm(want)
    by_key = {r[0]: r[1] for r in got}
    # overlap semantics: 'broad' [150,450) intersects short/medium/long,
    # so totals exceed the corpus count iff overlap is honored
    n_docs = docs_small.count()
    assert sum(by_key.values()) > n_docs
    # an impossible range still emits a zero row
    got2 = range_agg(docs_small, "n_chars",
                     [("none", 10_000, 20_000)]).collect()
    assert [tuple(r) for r in got2] == [("none", 0)]


def test_filters_agg_matches_oracle_one_job(spark, docs_small):
    from engine.aggs_bucket import filters_agg, filters_oracle_sql

    cols = {
        "english": F.col("lang") == "en",
        "mentions_spark": F.lower(F.coalesce(F.col("text"), F.lit(""))
                                  ).contains("spark"),
        "short": F.col("n_chars") < 200,
    }
    sqls = {
        "english": "lang = 'en'",
        "mentions_spark": "contains(lower(coalesce(text, '')), 'spark')",
        "short": "n_chars < 200",
    }
    got = [tuple(r) for r in filters_agg(docs_small, cols).collect()]
    want = _duck(SF_SMOKE, filters_oracle_sql(sqls))
    assert _norm(got) == _norm(want)
    # all predicates in one aggregate: exactly one HashAggregate pair /
    # single-row shuffle, no per-filter scan
    plan = (filters_agg(docs_small, cols)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1


def test_adjacency_matrix_matches_oracle_and_intersections(spark, docs_small):
    from engine.aggs_bucket import (
        adjacency_matrix_agg,
        adjacency_matrix_oracle_sql,
    )

    cols = {
        "english": F.col("lang") == "en",
        "short": F.col("n_chars") < 250,
        "never": F.col("n_chars") < 0,
    }
    sqls = {
        "english": "lang = 'en'",
        "short": "n_chars < 250",
        "never": "n_chars < 0",
    }
    got = [tuple(r) for r in adjacency_matrix_agg(docs_small, cols).collect()]
    want = _duck(SF_SMOKE, adjacency_matrix_oracle_sql(sqls))
    assert _norm(got) == _norm(want)
    by_key = dict(got)
    # intersection arithmetic: |a&b| <= min(|a|, |b|); empty sets omitted
    assert by_key["english&short"] <= min(by_key["english"], by_key["short"])
    assert by_key["english&short"] > 0
    assert "never" not in by_key and "english&never" not in by_key
    # one scan for the whole matrix
    plan = (adjacency_matrix_agg(docs_small, cols)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1


# ---- round-5 continuation: multi_terms / rare_terms / weighted_avg / mad ----


def test_multi_terms_tiebreak(spark):
    from pyspark.sql import Row

    from engine.aggs import multi_terms_agg

    df = spark.createDataFrame(
        [Row(a="x", b="p"), Row(a="x", b="p"), Row(a="y", b="q"),
         Row(a="y", b="q"), Row(a="z", b="r")]
    )
    out = multi_terms_agg(df, ["a", "b"], size=2).collect()
    # count ties between (x,p) and (y,q) -> composite key ascending wins
    assert [(r.a, r.b) for r in out] == [("x", "p"), ("y", "q")]


def test_rare_terms_threshold(spark):
    from pyspark.sql import Row

    from engine.aggs import rare_terms_agg

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="a b d"),
         Row(doc_id=3, text="a b e")]
    )
    out = {r.term: r.doc_count for r in rare_terms_agg(df, 2, ngram=2).collect()}
    # "a b" in 3 docs -> excluded; the tail shingles are rare
    assert "a b" not in out
    assert out == {"b c": 1, "b d": 1, "b e": 1}


def test_weighted_avg_values(spark):
    from pyspark.sql import Row

    from engine.aggs import weighted_avg_agg

    df = spark.createDataFrame(
        [Row(g="a", v=10.0, w=1.0), Row(g="a", v=20.0, w=3.0),
         Row(g="b", v=5.0, w=2.0), Row(g="b", v=None, w=1.0)]
    )
    out = {r.g: r for r in weighted_avg_agg(df, "g", "v", "w").collect()}
    assert out["a"].weighted_avg == 17.5  # (10*1 + 20*3) / 4
    assert out["a"].value_count == 2
    assert out["b"].value_count == 1  # nulls not counted (ES value_count)


def test_mad_exact(spark):
    from pyspark.sql import Row

    from engine.aggs import mad_agg

    df = spark.createDataFrame(
        [Row(g="a", x=1), Row(g="a", x=2), Row(g="a", x=3),
         Row(g="a", x=4), Row(g="a", x=100)]
    )
    r = mad_agg(df, "g", "x").collect()[0]
    # median 3; |x-3| = [2,1,0,1,97] -> median 1 (robust to the outlier)
    assert r.mad == 1.0
