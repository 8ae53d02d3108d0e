"""Corpus determinism + doc-id assignment tests (SURVEY.md §5.2-1, §4.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.analysis import with_extracted_text
from engine.corpus import HOT_TERM, webpages, webpages_pandas
from engine.docids import assign_doc_ids, dedup_last_write_wins

N = 500


@pytest.fixture(scope="module")
def pages(spark):
    return webpages(spark, N, partitions=4).cache()


def test_corpus_deterministic_across_partitioning(spark):
    a = webpages(spark, 200, partitions=1).orderBy("url", "warc_ts").collect()
    b = webpages(spark, 200, partitions=13).orderBy("url", "warc_ts").collect()
    assert a == b


def test_corpus_matches_pandas_twin(spark, pages):
    spark_rows = {
        (r["url"], r["warc_ts"]): (r["text"], r["lang"], bytes(r["html"]))
        for r in pages.collect()
    }
    pdf = webpages_pandas(N)
    assert len(spark_rows) == len(pdf)
    for t in pdf.itertuples():
        key = (t.url, t.warc_ts.to_pydatetime())
        assert spark_rows[key] == (t.text, t.lang, bytes(t.html))


def test_special_rows(pages):
    rows = {r["url"]: r for r in pages.collect()}
    assert rows["https://site0.example/page/0"]["text"] == ""
    assert len(rows["https://site1.example/page/1"]["text"].split()) == 1
    assert "straße" in rows["https://site2.example/page/2"]["text"]
    # duplicate url pair: page/4 appears twice with different warc_ts
    dup = [r for r in pages.collect() if r["url"] == "https://site4.example/page/4"]
    assert len(dup) == 2 and dup[0]["warc_ts"] != dup[1]["warc_ts"]


def test_extraction_invariant_and_quarantine(pages):
    ext = with_extracted_text(pages)
    bad = ext.where(F.col("extract_error").isNotNull()).collect()
    assert [r["url"] for r in bad] == ["https://site3.example/page/3"]
    ok = ext.where(F.col("extract_error").isNull())
    # byte-identical extracted text per url (BASELINE.json invariant)
    assert ok.where(F.col("extracted_text") != F.col("text")).count() == 0


def test_hot_term_present_in_most_docs(pages):
    n_hot = pages.where(
        F.array_contains(F.split(F.col("text"), " "), HOT_TERM)
    ).count()
    assert 0.8 * N <= n_hot <= 0.95 * N


def test_doc_ids_window_vs_range_identical(spark, pages):
    deduped = dedup_last_write_wins(pages)
    w = assign_doc_ids(deduped, ["url", "warc_ts"], strategy="window")
    r = assign_doc_ids(deduped, ["url", "warc_ts"], strategy="range", num_partitions=7)
    wm = {x["url"]: x["doc_id"] for x in w.select("url", "doc_id").collect()}
    rm = {x["url"]: x["doc_id"] for x in r.select("url", "doc_id").collect()}
    assert wm == rm
    assert sorted(wm.values()) == list(range(len(wm)))


def test_doc_ids_with_base(spark, pages):
    ids = assign_doc_ids(pages.limit(50), ["url", "warc_ts"], base=1000)
    got = sorted(r["doc_id"] for r in ids.select("doc_id").collect())
    assert got == list(range(1000, 1050))


def test_fused_dedup_assign_ids_matches_window(spark, pages):
    """dedup_assign_ids_ranged == dedup_last_write_wins + assign_doc_ids
    (window oracle), and its piggybacked agg rows == a direct groupBy."""
    from engine.docids import dedup_assign_ids_ranged

    deduped = dedup_last_write_wins(pages)
    w = assign_doc_ids(deduped, ["url", "warc_ts"], strategy="window", base=100)
    cleanup: list = []
    fused, agg_rows = dedup_assign_ids_ranged(
        pages, base=100, num_partitions=7,
        group_cols=("lang",),
        agg_exprs=(F.sum(F.length("text")).alias("_sl"),),
        cleanup=cleanup,
    )
    try:
        wm = {x["url"]: x["doc_id"] for x in w.select("url", "doc_id").collect()}
        fm = {x["url"]: x["doc_id"] for x in fused.select("url", "doc_id").collect()}
        assert fm == wm
        # ids are frozen into the persisted blocks: re-collect is identical
        fm2 = {x["url"]: x["doc_id"] for x in fused.select("url", "doc_id").collect()}
        assert fm2 == fm
        # dedup kept the newest version of the duplicate url
        kept = fused.where(
            F.col("url") == "https://site4.example/page/4"
        ).collect()
        all_ts = [
            r["warc_ts"]
            for r in pages.where(
                F.col("url") == "https://site4.example/page/4"
            ).collect()
        ]
        assert len(kept) == 1 and kept[0]["warc_ts"] == max(all_ts)
        # piggybacked stats: cover every surviving doc exactly once and
        # match a direct post-dedup groupBy per group value
        assert sum(int(r["_cnt"]) for r in agg_rows) == len(wm)
        per_lang: dict[str, list[int]] = {}
        for r in agg_rows:
            acc = per_lang.setdefault(r["lang"], [0, 0])
            acc[0] += int(r["_cnt"])
            acc[1] += int(r["_sl"] or 0)
        direct = {
            r["lang"]: [int(r["c"]), int(r["s"])]
            for r in deduped.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.sum(F.length("text")).alias("s"),
            )
            .collect()
        }
        assert per_lang == direct
    finally:
        for c in cleanup:
            c.unpersist()


def test_dedup_last_write_wins(spark, pages):
    deduped = dedup_last_write_wins(pages)
    assert deduped.count() == N - 1  # one dup pair collapsed
    kept = deduped.where(F.col("url") == "https://site4.example/page/4").collect()
    all_ts = [
        r["warc_ts"]
        for r in pages.where(F.col("url") == "https://site4.example/page/4").collect()
    ]
    assert kept[0]["warc_ts"] == max(all_ts)
