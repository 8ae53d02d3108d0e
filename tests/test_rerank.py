"""collapse_topk / rescore_topk / regexp_match semantics.

ES contracts under test (beyond the driver's oracle hash):
- collapse: at most one hit per field value; that hit is the group's
  best-scoring doc (doc_id tie-break); collapsing never changes a
  surviving doc's score.
- rescore: only first-pass top-window docs can appear; a window doc not
  matching the rescore query keeps query_weight * first (second = 0); a
  doc OUTSIDE the window never appears even if its combined score would
  beat window members (the ES semantics that make rescore bounded).
- regexp: Lucene whole-term anchoring — no substring matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.query import bm25_topk
from engine.rerank import collapse_topk, rescore_topk
from engine.wildcard import regexp_match

TERMS = ["spark", "vector", "merge", "table"]


def test_collapse_one_hit_per_group_and_best(spark, docs_small):
    out = collapse_topk(spark, docs_small, TERMS, "source", k=10).collect()
    sources = [r["source"] for r in out]
    assert len(sources) == len(set(sources)) == 10

    # each surviving hit is its group's best: no other doc in the same
    # source scores higher (or equal with a smaller doc_id) in the
    # uncollapsed ranking
    full = bm25_topk(spark, docs_small, TERMS, k=10**6)
    by_doc = {r["doc_id"]: r["score"] for r in full.collect()}
    src = {
        r["doc_id"]: r["source"]
        for r in docs_small.select("doc_id", "source").collect()
    }
    for r in out:
        assert r["score"] == by_doc[r["doc_id"]]  # collapse keeps the score
        better = [
            d for d, s in by_doc.items()
            if src[d] == r["source"]
            and (s > r["score"] or (s == r["score"] and d < r["doc_id"]))
        ]
        assert better == []


def test_rescore_window_bound_and_fallthrough(spark, docs_small):
    window = 15
    first = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(spark, docs_small, TERMS, k=window).collect()
    }
    out = rescore_topk(
        spark, docs_small, TERMS, ["hash", "join"],
        window_size=window, k=window, query_weight=1.0, rescore_weight=2.0,
    ).collect()
    # every result comes from the first-pass window, carrying its score
    assert {r["doc_id"] for r in out} == set(first)
    for r in out:
        assert r["first_score"] == first[r["doc_id"]]
        # combined >= first (rescore terms only add; weight 1.0 on first)
        assert r["score"] >= r["first_score"]

    # a rescore query matching nothing leaves ranking = first pass
    flat = rescore_topk(
        spark, docs_small, TERMS, ["zzznoterm"],
        window_size=window, k=window,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in flat] == [
        (r["doc_id"], r["first_score"]) for r in flat
    ]
    assert {r["doc_id"] for r in flat} == set(first)


def test_regexp_whole_term_anchoring(spark, docs_small):
    # "ar" appears inside spark/part — anchored regexp must match nothing
    assert regexp_match(spark, docs_small, "ar", k=10).count() == 0
    # alternation over full terms does match
    hits = regexp_match(spark, docs_small, "key|query", k=10**6)
    brute = (
        docs_small.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("t"),
        )
        .where(F.col("t").isin("key", "query"))
        .select("doc_id")
        .distinct()
    )
    assert hits.count() == brute.count()
