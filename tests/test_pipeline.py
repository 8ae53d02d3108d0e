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


def test_stratified_sample_deterministic_across_parallelism(spark, docs_mid):
    from engine.pipeline import stratified_sample

    rates = {"en": 1.0, "fr": 0.3, "*": 0.1}
    a = stratified_sample(spark, docs_mid, rates)
    b = stratified_sample(spark, docs_mid.repartition(13), rates)
    ka = sorted(r["doc_id"] for r in a.collect())
    kb = sorted(r["doc_id"] for r in b.collect())
    assert ka == kb and len(ka) > 0
    # en kept in full; non-listed langs thinned to roughly their rate
    langs = {r["doc_id"]: r["lang"] for r in docs_mid.select("doc_id", "lang").collect()}
    n_en_total = sum(1 for v in langs.values() if v == "en")
    n_en_kept = sum(1 for d in ka if langs[d] == "en")
    assert n_en_kept == n_en_total
