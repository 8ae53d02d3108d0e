"""Training-corpus prep ops (engine/trainprep.py): chunking, C4-style span
dedup, PII redaction, benchmark contamination."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from engine.trainprep import (
    chunk_dedup,
    contamination,
    pii_redact,
    token_chunks,
)


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_token_chunks_windows_and_tail(spark):
    df = _df(spark, [(1, " ".join(f"w{i}" for i in range(25)))])
    out = token_chunks(df, window=10, stride=10).orderBy("chunk_idx").collect()
    # 25 tokens, stride 10 -> starts 0/10/20: two full windows + 5-token tail
    assert [r.chunk_len for r in out] == [10, 10, 5]
    assert out[0].chunk_text.split(" ") == [f"w{i}" for i in range(10)]
    assert out[2].chunk_text == "w20 w21 w22 w23 w24"


def test_token_chunks_overlap_and_empty(spark):
    df = _df(spark, [(1, "a b c d e"), (2, ""), (3, None)])
    out = token_chunks(df, window=3, stride=2).orderBy("doc_id", "chunk_idx")
    rows = out.collect()
    # empty/null docs produce nothing; doc 1: starts 0,2,4
    assert {r.doc_id for r in rows} == {1}
    assert [r.chunk_text for r in rows] == ["a b c", "c d e", "e"]


def test_chunk_dedup_keeps_first_occurrence(spark):
    # doc 1 and doc 2 share an 8-token chunk verbatim; doc 2's copy must go
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = _df(
        spark,
        [(1, shared + " tail one two three four five six seven"),
         (2, shared + " other words here pad pad pad pad pad")],
    )
    out = {r.doc_id: r for r in chunk_dedup(df, chunk_tokens=8).collect()}
    assert out[1].n_removed == 0
    assert out[2].n_removed == 1
    assert out[1].clean_text.startswith(shared)
    assert not out[2].clean_text.startswith("alpha")
    assert out[2].clean_text == "other words here pad pad pad pad pad"


def test_chunk_dedup_adversarial_identical_corpus(spark):
    # the C4 melt-down shape: every doc identical. Exactly ONE copy of each
    # chunk survives corpus-wide; all other docs drain to empty.
    text = " ".join(f"t{i}" for i in range(16))
    df = _df(spark, [(i, text) for i in range(50)])
    out = chunk_dedup(df, chunk_tokens=8)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 50
    assert rows[0].n_removed == 0 and rows[0].clean_text == text
    for i in range(1, 50):
        assert rows[i].n_removed == 2 and rows[i].clean_text == ""
    # output row count stays linear in docs, not quadratic in duplicates
    assert out.count() == 50


def test_pii_redact_patterns(spark):
    df = _df(
        spark,
        [(1, "mail bob.smith+x@sub.example.org now"),
         (2, "call 555-123-4567 or 555 987 6543"),
         (3, "host 192.168.0.1 up"),
         (4, "clean text no pii"),
         (5, None)],
    )
    out = {r.doc_id: r for r in pii_redact(df).collect()}
    assert out[1].n_emails == 1 and out[1].redacted == "mail <EMAIL> now"
    assert out[2].n_phones == 2
    assert out[2].redacted == "call <PHONE> or <PHONE>"
    assert out[3].n_ips == 1 and out[3].redacted == "host <IP> up"
    assert out[4].redacted == "clean text no pii"
    assert out[5].redacted == "" and out[5].n_emails == 0


def test_pii_email_not_double_counted_as_ip(spark):
    # the email host must be consumed by the email pass first
    df = _df(spark, [(1, "x a@10.0.0.12.com y 10.0.0.12 z")])
    r = pii_redact(df).collect()[0]
    assert r.n_emails == 1 and r.n_ips == 1
    assert r.redacted == "x <EMAIL> y <IP> z"


def test_contamination_flags_overlap(spark):
    bench = _df(spark, [(100, "one two three four five six seven eight")])
    train = _df(
        spark,
        [(1, "zzz one two three four five six seven eight yyy"),  # contains it
         (2, "totally different words with no overlap at all")],
    )
    out = contamination(train, bench, k=8).collect()
    assert [r.doc_id for r in out] == [1]
    r = out[0]
    # doc 1 has 3 distinct 8-gram shingles, 1 of which is the benchmark's
    assert r.n_shingles == 3 and r.n_hits == 1
    assert abs(r.hit_ratio - round(1 / 3, 4)) < 1e-9


def test_contamination_plan_broadcasts_benchmark(spark):
    bench = _df(spark, [(100, "one two three four five six seven eight")])
    train = _df(spark, [(1, "one two three four five six seven eight nine")])
    plan = contamination(train, bench, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---- quality classifier + tf-idf keywords (engine/textstats.py) ----


def test_quality_classifier_orders_prose_over_noise(spark):
    from engine.textstats import quality_classifier

    df = _df(
        spark,
        [(1, "the cat and the dog sat in that house for it was warm"),
         (2, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"),
         (3, None)],
    )
    out = {r.doc_id: r for r in quality_classifier(df).collect()}
    assert out[1].quality_score > out[2].quality_score
    assert out[1].keep == 1 and out[2].keep == 0
    assert out[3].keep == 0  # empty doc scores at the bias floor


def test_tfidf_keywords_topk_and_tiebreak(spark):
    from engine.textstats import tfidf_keywords

    df = _df(
        spark,
        [(1, "rare rare rare shared"),
         (2, "shared other other"),
         (3, "shared thing")],
    )
    out = tfidf_keywords(df, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # 'rare' (df=1) dominates doc 1; 'shared' (df=3) has idf ln(1)=0
    assert sorted(by_doc[1])[0] == (1, "rare")
    assert all(len(v) <= 2 for v in by_doc.values())
    # doc 3: both terms, tfidf 0 for shared; 'thing' (df=1) wins rank 1
    assert sorted(by_doc[3])[0] == (1, "thing")
