"""ES aggregations (engine/aggs.py) + search-API surface (engine/searchapi.py).

Each op is checked against a DuckDB run of its own *_oracle_sql builder on
the same parquet (the driver's gate, locally), plus targeted property
tests: cardinality_approx rel-error vs the exact tier, search_after page
disjointness/continuity, and highlight fragment shape.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

TERMS = ["spark", "vector", "merge", "table"]


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _norm(rows):
    return sorted(tuple(repr(v) for v in r) for r in rows)


def test_terms_agg_matches_oracle(spark, docs_small):
    from engine.aggs import terms_agg, terms_agg_oracle_sql

    got = _rows(terms_agg(docs_small, "lang", size=10, metric_col="n_chars"))
    want = _duck(SF_SMOKE, terms_agg_oracle_sql("lang", 10, "n_chars"))
    assert _norm(got) == _norm(want)
    # ES order contract: doc_count desc, key asc
    counts = [r[1] for r in got]
    assert counts == sorted(counts, reverse=True)


def test_date_histogram_matches_oracle(spark):
    from engine.aggs import date_histogram, date_histogram_oracle_sql

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    got = _rows(date_histogram(ev, "ts", "day", "value"))
    want = _duck(SF_SMOKE, date_histogram_oracle_sql("ts", "day", "value"))
    assert _norm(got) == _norm(want)
    assert all(isinstance(r[0], str) and len(r[0]) == 10 for r in got)


def test_stats_agg_matches_oracle(spark, docs_small):
    from engine.aggs import stats_agg, stats_agg_oracle_sql

    got = _rows(stats_agg(docs_small, TERMS))
    want = _duck(SF_SMOKE, stats_agg_oracle_sql(TERMS))
    assert _norm(got) == _norm(want)
    # stats run over ALL hits, not a top-k page
    n_hits = got[0][0]
    assert n_hits > 20


def test_cardinality_exact_and_approx(spark):
    from engine.aggs import (
        cardinality_agg,
        cardinality_agg_oracle_sql,
        cardinality_approx,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    got = _rows(cardinality_agg(ev, "event_type", "user_id"))
    want = _duck(SF_SMOKE, cardinality_agg_oracle_sql("event_type", "user_id"))
    assert _norm(got) == _norm(want)

    exact = dict(got)
    est = dict(_rows(cardinality_approx(ev, "event_type", "user_id", rsd=0.05)))
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) <= max(3, 0.15 * exact[k]), (k, e, exact[k])


def test_histogram_matches_oracle(spark, docs_small):
    from engine.aggs import histogram_agg, histogram_agg_oracle_sql

    got = _rows(histogram_agg(docs_small, "n_chars", 50, value_col="n_chars"))
    want = _duck(SF_SMOKE, histogram_agg_oracle_sql("n_chars", 50, "n_chars"))
    assert _norm(got) == _norm(want)
    # ES bucket contract: keys are multiples of the interval, counts sum
    # to the corpus
    assert all(b % 50 == 0 for b, c, a in got)
    assert sum(c for b, c, a in got) == docs_small.count()


def test_percentiles_exact_and_approx(spark, docs_small):
    from engine.aggs import (
        percentiles_agg,
        percentiles_agg_oracle_sql,
        percentiles_approx,
    )

    got = _rows(percentiles_agg(docs_small, "n_chars"))
    want = _duck(SF_SMOKE, percentiles_agg_oracle_sql("n_chars"))
    assert _norm(got) == _norm(want)
    vals = [v for p, v in got]
    assert vals == sorted(vals)  # monotone in the percentile

    exact = dict(got)
    approx = dict(_rows(percentiles_approx(docs_small, "n_chars")))
    assert set(approx) == set(exact)
    lo, hi = min(exact.values()), max(exact.values())
    for p, v in approx.items():
        assert abs(v - exact[p]) <= 0.05 * (hi - lo) + 1, (p, v, exact[p])


def test_shard_doc_stats_metadata_equals_scan(spark, store_small):
    """Metadata-served per-routing stats == full data-scan answer."""
    from engine.aggs import routing_doc_counts

    store = store_small
    got = {r["routing"]: (r["n_docs"], r["sum_dl"])
           for r in routing_doc_counts(spark, store).collect()}
    scan = {
        r["routing"]: (r["n"], r["s"])
        for r in store.docs(spark)
        .groupBy("routing")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s"))
        .collect()
    }
    assert got == scan and got


def test_sort_search_after_pagination(spark, docs_small):
    """Pages are disjoint, ordered, and concatenate to the global sort."""
    from engine.searchapi import sort_search_after

    k = 25
    page1 = _rows(sort_search_after(docs_small, "n_chars", after=None, k=k))
    cursor = (page1[-1][1], page1[-1][0])  # (n_chars, doc_id) of last hit
    page2 = _rows(sort_search_after(docs_small, "n_chars", after=cursor, k=k))

    assert len(page1) == k and len(page2) == k
    assert not {r[0] for r in page1} & {r[0] for r in page2}
    # concatenation equals the first 2k of a single global sort
    allrows = _rows(sort_search_after(docs_small, "n_chars", after=None, k=2 * k))
    assert page1 + page2 == allrows


def test_mget_store_point_lookup(spark, store_small):
    from engine.searchapi import mget_store

    docs = store_small.docs(spark)
    urls = [r["url"] for r in docs.orderBy("doc_id").limit(3).collect()]
    got = mget_store(spark, store_small, urls + ["doc://nonexistent"])
    rows = got.collect()
    assert sorted(r["url"] for r in rows) == sorted(urls)
    # pushed lookup: the In filter reaches the parquet scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "url" in plan


def test_count_query_store_matches_corpus(spark, store_small, docs_small):
    from engine.analysis import tokens
    from engine.searchapi import count_query_store

    want = (
        docs_small.select(tokens("text").alias("t"))
        .where(F.arrays_overlap("t", F.array(*[F.lit(t) for t in TERMS])))
        .count()
    )
    got = count_query_store(spark, store_small, TERMS).collect()[0]["n_hits"]
    assert got == want > 0


def test_highlight_fragments(spark, docs_small):
    from engine.query import bm25_topk
    from engine.searchapi import highlight_snippets

    hits = bm25_topk(spark, docs_small, TERMS, k=10).select("doc_id")
    page = hits.join(docs_small.select("doc_id", "text"), "doc_id")
    frags = {r["doc_id"]: r["fragment"]
             for r in highlight_snippets(page, TERMS).collect()}
    assert len(frags) == 10
    for did, frag in frags.items():
        assert frag is not None and "<em>" in frag and "</em>" in frag
        marked = frag.split("<em>")[1].split("</em>")[0]
        assert marked in TERMS


def test_highlight_no_match_is_null(spark):
    from engine.searchapi import highlight_snippets

    df = spark.createDataFrame(
        [(1, "nothing relevant here"), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["fragment"]
            for r in highlight_snippets(df, ["zzzmissing"]).collect()}
    assert rows == {1: None, 2: None}


def test_range_filter_is_non_scoring(spark, docs_small):
    """ES filter context: the range clause gates membership but never
    changes a surviving doc's score."""
    from engine.query import bm25_topk

    allowed = docs_small.where(F.col("n_chars").between(250, 450))
    filtered = dict(_rows(bm25_topk(
        spark, docs_small, TERMS, k=50,
        filter_docs=allowed.select("doc_id"),
    )))
    unfiltered = dict(_rows(bm25_topk(spark, docs_small, TERMS, k=500)))
    allowed_ids = {r["doc_id"] for r in allowed.select("doc_id").collect()}
    assert filtered and set(filtered) <= allowed_ids
    for did, score in filtered.items():
        assert unfiltered[did] == score


def test_explain_contributions_sum_to_score(spark, docs_small):
    from engine.query import bm25_topk
    from engine.searchapi import explain_scores

    scores = dict(_rows(bm25_topk(spark, docs_small, TERMS, k=10)))
    rows = explain_scores(spark, docs_small, TERMS, k=10).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(scores)
    for did, parts in by_doc.items():
        total = sum(p["contribution"] for p in parts)
        # each contribution is rounded to 4dp before summing
        assert abs(total - scores[did]) <= 1e-4 * (len(parts) + 1)
        for p in parts:
            assert p["term"] in TERMS and p["tf"] >= 1 and p["df"] >= 1


def test_significant_terms_properties(spark, docs_small):
    from engine.aggs import significant_terms

    rows = _rows(significant_terms(docs_small, ["spark", "table"],
                                   size=10, min_doc_count=3))
    assert 0 < len(rows) <= 10
    for term, fg_df, bg_df, score in rows:
        assert fg_df <= bg_df and fg_df >= 3
    # the query terms themselves are maximally foreground-concentrated
    terms_ranked = [r[0] for r in rows]
    assert "spark" in terms_ranked and "table" in terms_ranked


def test_more_like_this_excludes_source(spark, docs_small):
    from engine.searchapi import more_like_this

    src = 7
    rows = _rows(more_like_this(spark, docs_small, src, max_query_terms=10, k=20))
    assert len(rows) == 20
    assert src not in {r[0] for r in rows}
    # deterministic: re-run yields the identical page
    again = _rows(more_like_this(spark, docs_small, src, max_query_terms=10, k=20))
    assert rows == again


def test_function_score_reranks_by_factor(spark, docs_small):
    from engine.searchapi import function_score_topk

    import math

    from engine.query import bm25_topk

    plain = dict(_rows(bm25_topk(spark, docs_small, TERMS, k=500)))
    boosted = dict(_rows(function_score_topk(
        spark, docs_small, TERMS, "n_chars", k=500, modifier="log1p")))
    raw = dict(_rows(function_score_topk(
        spark, docs_small, TERMS, "n_chars", k=500, modifier="none")))
    assert set(plain) == set(boosted) == set(raw)  # same hit set
    chars = {r["doc_id"]: r["n_chars"]
             for r in docs_small.select("doc_id", "n_chars").collect()}
    for did, s in boosted.items():
        # boost_mode multiply: bm25 * log1p(n_chars) (plain is rounded,
        # so allow rounding slack)
        expect = plain[did] * math.log1p(chars[did])
        assert abs(s - expect) < 1e-3 * max(1.0, abs(expect))
        # modifier "none" multiplies by the raw field value
        expect_raw = plain[did] * chars[did]
        assert abs(raw[did] - expect_raw) < 1e-3 * max(1.0, abs(expect_raw))
    with pytest.raises(ValueError):
        function_score_topk(spark, docs_small, TERMS, "n_chars",
                            modifier="bogus")


def test_dismax_bounds_and_tiebreaker(spark, docs_small):
    """best_fields lies between the best single field and most_fields:
    tie_breaker=0 is max(field scores), 1.0 equals most_fields."""
    from engine.query import bm25_topk_fields

    docs = docs_small.withColumn(
        "title", F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
    )
    fields = [("title", 2.0), ("text", 1.0)]
    most = dict(_rows(bm25_topk_fields(spark, docs, TERMS, fields, k=300)))
    dmax0 = dict(_rows(bm25_topk_fields(spark, docs, TERMS, fields, k=300,
                                        mode="best_fields", tie_breaker=0.0)))
    dmax1 = dict(_rows(bm25_topk_fields(spark, docs, TERMS, fields, k=300,
                                        mode="best_fields", tie_breaker=1.0)))
    shared = set(most) & set(dmax0) & set(dmax1)
    assert len(shared) > 50
    for did in shared:
        assert dmax0[did] <= dmax1[did] + 1e-4
        assert abs(dmax1[did] - most[did]) <= 2e-4  # tb=1 == most_fields
    with pytest.raises(ValueError):
        bm25_topk_fields(spark, docs, TERMS, fields, mode="bogus")


def test_boosting_demotes_not_excludes(spark, docs_small):
    from engine.query import bm25_topk
    from engine.searchapi import boosting_query

    neg = ["slow"]
    # k > corpus size so both pages hold the FULL hit set (a smaller k
    # would truncate the two differently-ordered lists to different sets)
    plain = dict(_rows(bm25_topk(spark, docs_small, TERMS, k=1000)))
    boosted = dict(_rows(boosting_query(
        spark, docs_small, TERMS, neg, negative_boost=0.5, k=1000)))
    assert set(plain) == set(boosted)  # demotion, never exclusion
    from engine.analysis import tokens as tok
    neg_ids = {r["doc_id"] for r in docs_small
               .where(F.arrays_overlap(tok("text"), F.array(F.lit("slow"))))
               .select("doc_id").collect()}
    demoted = [d for d in plain if d in neg_ids]
    assert demoted, "fixture needs at least one demoted doc"
    for did in plain:
        factor = 0.5 if did in neg_ids else 1.0
        assert abs(boosted[did] - plain[did] * factor) <= 2e-4


def test_term_suggest_modes(spark, docs_small):
    from engine.fuzzy import corpus_vocab_df, term_suggest

    vocab = corpus_vocab_df(docs_small)
    rows = _rows(term_suggest(vocab, "scor", size=8, max_edits=2))
    assert rows, "expected at least one suggestion"
    # ranked (dist asc, df desc, term asc); never suggests the input itself
    keys = [(d, -df, s) for s, d, df in rows]
    assert keys == sorted(keys)
    assert all(s != "scor" and d <= 2 for s, d, df in rows)

    # popular mode: only terms more frequent than the input's own df
    # (input df is 0 here, so popular == always for this seed)
    pop = _rows(term_suggest(vocab, "scor", size=8, max_edits=2,
                             suggest_mode="popular"))
    assert pop == rows

    # a seed that IS a common vocab term: popular mode only keeps
    # strictly-more-frequent corrections
    own = {s: df for s, d, df in
           _rows(term_suggest(vocab, "table", size=50, max_edits=1))}
    own_df = vocab.where(F.col("term") == "table").collect()[0]["df"]
    pop2 = _rows(term_suggest(vocab, "table", size=50, max_edits=1,
                              suggest_mode="popular"))
    assert all(df > own_df for s, d, df in pop2)
    assert {s for s, d, df in pop2} <= set(own)

    with pytest.raises(ValueError):
        term_suggest(vocab, "x", suggest_mode="bogus")


@pytest.fixture(scope="module")
def store_small(spark):
    """Small routed store (routing=lang) shared by the store-backed tests."""
    import __spark_entry__ as mod

    return mod._shared_store(spark, SF_SMOKE)
