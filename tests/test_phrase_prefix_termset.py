"""match_phrase_prefix (engine/phrase.py) and terms_set (engine/searchapi.py).

Oracle parity plus the semantics that distinguish them: the prefix
expansion cap excludes completions outside the top-max_expansions terms,
and terms_set enforces a PER-DOC minimum (not a global one).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

TERMS = ["spark", "vector", "merge", "table"]


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def _norm(rows):
    return sorted(tuple(repr(v) for v in r) for r in rows)


def test_phrase_prefix_matches_oracle(spark, docs_small):
    from engine.phrase import phrase_prefix_freqs, phrase_prefix_oracle_sql

    got = [tuple(r) for r in
           phrase_prefix_freqs(spark, docs_small, ["table", "ha"],
                               max_expansions=10).collect()]
    want = _duck(SF_SMOKE,
                 phrase_prefix_oracle_sql(["table", "ha"], max_expansions=10))
    assert _norm(got) == _norm(want)
    assert len(got) > 0


def test_phrase_prefix_is_superset_of_exact_phrase(spark, docs_small):
    from engine.phrase import phrase_frequencies, phrase_prefix_freqs

    exact = {r["doc_id"]: r["ptf"] for r in
             phrase_frequencies(spark, docs_small, ["table", "hash"]).collect()}
    pref = {r["doc_id"]: r["pptf"] for r in
            phrase_prefix_freqs(spark, docs_small, ["table", "ha"],
                                max_expansions=50).collect()}
    # every exact "table hash" occurrence is a "table ha*" occurrence
    assert set(exact) <= set(pref)
    assert all(pref[d] >= exact[d] for d in exact)


def test_phrase_prefix_expansion_cap_excludes_terms(spark, docs_small):
    from engine.phrase import phrase_prefix_freqs

    # with a cap of 1, only the lexicographically-first completion counts;
    # docs matching only via later completions drop out (ES max_expansions)
    full = {r["doc_id"] for r in
            phrase_prefix_freqs(spark, docs_small, ["the", "s"],
                                max_expansions=1000).collect()}
    capped = {r["doc_id"] for r in
              phrase_prefix_freqs(spark, docs_small, ["the", "s"],
                                  max_expansions=1).collect()}
    assert capped <= full
    assert len(capped) < len(full)  # the cap actually bites on "the s*"


def test_terms_set_matches_oracle(spark, docs_small):
    from engine.searchapi import terms_set_oracle_sql, terms_set_topk

    got = [tuple(r) for r in
           terms_set_topk(spark, docs_small, TERMS, k=20).collect()]
    want = _duck(SF_SMOKE, terms_set_oracle_sql(TERMS, k=20))
    assert _norm(got) == _norm(want)


def test_terms_set_minimum_is_per_document(spark, docs_small):
    from engine.searchapi import terms_set_topk

    rows = terms_set_topk(spark, docs_small, TERMS, k=1000).collect()
    assert all(r["matched"] >= r["required"] for r in rows)
    # the per-doc thresholds actually vary across returned docs (a global
    # minimum_should_match could not produce this)
    assert len({r["required"] for r in rows}) > 1
    # and the dynamic threshold excludes docs a required=1 floor would keep
    floor1 = terms_set_topk(spark, docs_small, TERMS, k=1000,
                            msm_divisor=10**9).collect()
    assert len(floor1) > len(rows)


def test_msearch_equals_per_query_bm25(spark, docs_small):
    """Each query's slice of the batch result must equal its standalone
    bm25_topk (same formula, same rounding, same tie-break)."""
    from engine.query import bm25_topk
    from engine.searchapi import msearch_topk

    batch = {"a": ["spark", "table"], "b": ["the"], "c": TERMS}
    out = msearch_topk(spark, docs_small, batch, k=12).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, terms in batch.items():
        solo = [(r["doc_id"], r["score"]) for r in
                bm25_topk(spark, docs_small, terms, k=12).collect()]
        assert by_q[qid] == solo, qid
    # ranks are 1..k per query
    ranks = [r["rank"] for r in out if r["query_id"] == "a"]
    assert ranks == list(range(1, len(ranks) + 1))


def test_msearch_single_scan_plan(spark, docs_small):
    from engine.searchapi import msearch_topk

    def scan_count(batch):
        df = msearch_topk(spark, docs_small, batch, k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Scan parquet"), plan.count("WindowGroupLimit")

    two = scan_count({"a": ["spark"], "b": ["table"]})
    five = scan_count({f"q{i}": [t] for i, t in
                       enumerate(["spark", "table", "the", "data", "hash"])})
    # the corpus-pass count is INDEPENDENT of the batch size (queries ride
    # the same tf/dl/stats relations), and the per-query top-k is a
    # map-side+final WindowGroupLimit pair
    assert two[0] == five[0]
    assert two[1] >= 2 and five[1] >= 2


def test_rank_eval_metrics_sanity(spark, docs_small):
    """Metric identities on a constructed case: a qrels set equal to the
    exact top-k gives precision=recall=mrr=ndcg=1; disjoint judgments give
    all zeros except ndcg (0/idcg = 0)."""
    from engine.query import bm25_topk
    from engine.searchapi import rank_eval

    top = [r["doc_id"] for r in
           bm25_topk(spark, docs_small, ["spark"], k=5).collect()]
    perfect = {"q": {int(d): 1 for d in top}}
    row = rank_eval(spark, docs_small, {"q": ["spark"]}, perfect,
                    k=5).collect()[0]
    assert (row["precision_k"], row["recall_k"], row["mrr"],
            row["ndcg_k"]) == (1.0, 1.0, 1.0, 1.0)
    # judged docs never retrieved -> zero precision/recall/mrr/ndcg
    absent = {"q": {999999: 2, 999998: 1}}
    row0 = rank_eval(spark, docs_small, {"q": ["spark"]}, absent,
                     k=5).collect()[0]
    assert (row0["precision_k"], row0["recall_k"], row0["mrr"],
            row0["ndcg_k"]) == (0.0, 0.0, 0.0, 0.0)
    # graded order matters: swapping grades between rank-1 and rank-5
    # changes NDCG but not precision
    graded_hi = {"q": {int(top[0]): 3, int(top[4]): 1}}
    graded_lo = {"q": {int(top[0]): 1, int(top[4]): 3}}
    hi = rank_eval(spark, docs_small, {"q": ["spark"]}, graded_hi, k=5).collect()[0]
    lo = rank_eval(spark, docs_small, {"q": ["spark"]}, graded_lo, k=5).collect()[0]
    assert hi["precision_k"] == lo["precision_k"]
    assert hi["ndcg_k"] > lo["ndcg_k"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="without positive judgments"):
        rank_eval(spark, docs_small, {"q": ["spark"]}, {"q": {}}, k=5)


def test_span_near_slop0_equals_exact_phrase(spark, docs_small):
    """slop=0 distinct-start counts must equal exact phrase frequencies
    when the phrase has no repeated terms (distinct starts == occurrences)."""
    from engine.phrase import phrase_frequencies, span_near_freqs

    phrase = ["table", "hash"]
    exact = {(r["doc_id"], r["ptf"]) for r in
             phrase_frequencies(spark, docs_small, phrase).collect()}
    span0 = {(r["doc_id"], r["snf"]) for r in
             span_near_freqs(spark, docs_small, phrase, slop=0).collect()}
    assert exact == span0 and len(exact) > 0


def test_span_near_slop_widens_monotonically(spark, docs_small):
    from engine.phrase import span_near_freqs

    phrase = ["table", "hash"]
    by_slop = {}
    for s in (0, 2, 5):
        by_slop[s] = {r["doc_id"]: r["snf"] for r in
                      span_near_freqs(spark, docs_small, phrase, slop=s).collect()}
    assert set(by_slop[0]) <= set(by_slop[2]) <= set(by_slop[5])
    assert len(by_slop[5]) > len(by_slop[0])  # wider slop finds more docs
    # per-doc counts never shrink as slop grows
    for d, c in by_slop[0].items():
        assert by_slop[2][d] >= c


def test_span_near_three_terms_and_guards(spark, docs_small):
    import pytest as _pytest

    from engine.phrase import span_near_freqs, span_near_oracle_sql

    got = [tuple(r) for r in
           span_near_freqs(spark, docs_small, ["the", "table", "the"],
                           slop=3).collect()]
    want = _duck(SF_SMOKE,
                 span_near_oracle_sql(["the", "table", "the"], slop=3))
    assert _norm(got) == _norm(want) and len(got) > 0
    with _pytest.raises(ValueError):
        span_near_freqs(spark, docs_small, ["one"], slop=1)
    with _pytest.raises(ValueError):
        span_near_freqs(spark, docs_small, ["a", "b"], slop=-1)
