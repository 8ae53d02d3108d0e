"""training_corpus composition semantics: each gate (language, length,
stopword ratio) excludes independently; exact duplicates keep min doc_id."""

from __future__ import annotations

from engine.pipeline import training_corpus

EN = "the quick data table is good for the scan and it was fast " * 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gates_and_canonical(spark):
    docs = _docs(spark, [
        (1, EN),                        # kept
        (2, EN),                        # exact dup of 1 -> dropped (id 1 wins)
        (3, "le chat est dans la maison et il est pour une " * 6),  # fr
        (4, "the of and"),              # too short
        (5, "data table scan merge join hash " * 10),  # no stopwords
        (6, EN + " extra tail tokens here the end"),    # kept (distinct fp)
    ])
    out = training_corpus(spark, docs, min_tokens=30).collect()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [1, 6]
    row = {r["doc_id"]: r for r in out}
    assert row[1]["lang_pred"] == "en"
    assert row[1]["n_tokens"] >= 30
    assert row[1]["stopword_ratio"] >= 0.01
