"""percolate semantics: conjunctive vs minimum_should_match, distinct-term
counting (repeats in a doc count once), non-matching queries absent."""

from __future__ import annotations

from engine.percolate import percolate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_conjunctive_and_msm(spark):
    docs = _docs(spark, [
        (1, "spark join spark join"),   # both terms (repeated)
        (2, "spark only here"),         # one of two
        (3, "vector merge"),            # 2 of 3 for query 20
        (4, "vector alone"),            # 1 of 3
    ])
    queries = [
        (10, ["spark", "join"], 2),
        (20, ["vector", "merge", "table"], 2),
    ]
    got = {
        (r["doc_id"], r["query_id"]): r["n_matched"]
        for r in percolate(spark, docs, queries).collect()
    }
    # doc1 matches query10 with n_matched=2 (distinct terms, not 4 repeats)
    assert got == {(1, 10): 2, (3, 20): 2}


def test_case_folding_and_empty(spark):
    docs = _docs(spark, [(1, "Spark JOIN"), (2, "")])
    got = percolate(spark, docs, [(5, ["SPARK", "join"], 2)]).collect()
    assert [(r["doc_id"], r["query_id"]) for r in got] == [(1, 5)]


def test_exists_semantics(spark):
    from engine.searchapi import exists_query

    docs = spark.createDataFrame(
        [(1, "real content"), (2, ""), (3, None), (4, "   "), (5, "...")],
        "doc_id long, text string",
    )
    got = [r["doc_id"] for r in exists_query(spark, docs, "text").collect()]
    # empty, null, whitespace-only, and punctuation-only (zero tokens after
    # analysis) all do NOT exist — ES analyzed-field semantics
    assert got == [1]


def test_sliced_export_partition(spark, docs_small):
    from engine.searchapi import sliced_export

    slices = [
        {r["doc_id"] for r in sliced_export(spark, docs_small, i, 4).collect()}
        for i in range(4)
    ]
    all_ids = {r["doc_id"] for r in docs_small.select("doc_id").collect()}
    assert set().union(*slices) == all_ids
    assert sum(len(s) for s in slices) == len(all_ids)  # disjoint
    # stable across parallelism
    again = {
        r["doc_id"]
        for r in sliced_export(spark, docs_small.repartition(7), 1, 4).collect()
    }
    assert again == slices[1]


def test_phrase_suggest_semantics(spark):
    from engine.fuzzy import phrase_suggest

    vocab = spark.createDataFrame(
        [("spark", 100), ("table", 80), ("hash", 60), ("tables", 90)],
        "term string, df long",
    )
    out = phrase_suggest(spark, vocab, "spak tabel hash zzzzzzzzzz").collect()
    by_pos = {r["pos"]: r for r in out}
    assert by_pos[0]["suggestion"] == "spark" and by_pos[0]["dist"] == 1
    # "tabel" is 1 edit from BOTH table and tables -> higher df wins
    assert by_pos[1]["suggestion"] == "tables"
    # exact vocab hit: dist 0, kept
    assert by_pos[2]["suggestion"] == "hash" and by_pos[2]["dist"] == 0
    # no candidate within 2 edits: input kept verbatim, dist -1, df 0
    assert by_pos[3]["suggestion"] == "zzzzzzzzzz"
    assert by_pos[3]["dist"] == -1 and by_pos[3]["df"] == 0


def test_completion_includes_exact_term(spark):
    from engine.fuzzy import completion_suggest

    vocab = spark.createDataFrame(
        [("spark", 10), ("sparkle", 90), ("spar", 5), ("zebra", 99)],
        "term string, df long",
    )
    got = [
        (r["suggestion"], r["df"])
        for r in completion_suggest(vocab, "spark", size=5).collect()
    ]
    # df-desc ranking; the fully typed word suggests itself (ES parity)
    assert got == [("sparkle", 90), ("spark", 10)]
