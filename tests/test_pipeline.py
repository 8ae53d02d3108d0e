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


def test_repetition_stats_edges(spark):
    from engine.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),            # all distinct
            (2, "x x x x x x"),          # fully repeated
            (3, "one two"),              # < 3 tokens: no 3-grams
            (4, ""),                     # empty
            (5, "p q r p q r p q r"),    # repeated 3-gram pattern
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["dup_token_frac"] == 0.0 and got[1]["dup_3gram_frac"] == 0.0
    assert got[2]["dup_token_frac"] > 0.8 and got[2]["dup_3gram_frac"] > 0.7
    assert got[3]["dup_3gram_frac"] == 0.0  # guard: no downward sequence
    assert got[4]["n_tokens"] == 0 and got[4]["dup_token_frac"] == 0.0
    # 9 tokens -> 7 grams, distinct grams = 3 -> 1 - 3/7
    assert abs(got[5]["dup_3gram_frac"] - (1 - 3 / 7)) < 1e-3


def test_unigram_logprob_ranks_gibberish_low(spark):
    from engine.textstats import unigram_logprob

    # common-word doc vs a doc of corpus-rare tokens: the rare doc must
    # score lower mean logprob (higher perplexity) under the corpus model
    docs = spark.createDataFrame(
        [
            (1, "the the the cat cat"),
            (2, "zzq xkw vvt"),
            (3, "the cat zzq"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert got[1]["mean_logprob"] > got[3]["mean_logprob"] > got[2]["mean_logprob"]
    assert got[2]["perplexity"] > got[1]["perplexity"]
    assert got[1]["n_tokens"] == 5
