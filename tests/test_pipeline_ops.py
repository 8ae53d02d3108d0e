"""Training-data pipeline ops: textstats, dedup family, similarity search.

Each SQL-expressible op is checked against DuckDB here (same harness the
driver uses); the probabilistic ops (MinHash LSH, SimHash, ANN) are checked
for recall/consistency against their exact counterparts.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.dedup import (
    exact_duplicates,
    exact_duplicates_oracle_sql,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_oracle_sql,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash64,
)
from engine.similarity import (
    ann_lsh_topk,
    cosine_pairs,
    cosine_pairs_oracle_sql,
    cosine_topk,
    cosine_topk_oracle_sql,
)
from engine.textstats import (
    fingerprint,
    fingerprint_oracle_sql,
    lang_id,
    lang_id_oracle_sql,
    quality_features,
    quality_features_oracle_sql,
    token_count_bpe,
    token_count_bpe_oracle_sql,
)

SF = "/root/testdata/sf0.01"


def _duck(sql: str, **tables) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    for name, pdf in tables.items():
        con.register(name, pdf)
    return con.execute(sql).df()


def _cmp(spark_df, sql):
    got = spark_df.toPandas()
    want = _duck(sql)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)


# ---- textstats --------------------------------------------------------------


def test_quality_features_vs_oracle(spark, docs_mid):
    _cmp(quality_features(docs_mid), quality_features_oracle_sql())


def test_token_count_vs_oracle(spark, docs_mid):
    _cmp(token_count_bpe(docs_mid), token_count_bpe_oracle_sql())


def test_lang_id_vs_oracle(spark, docs_mid):
    _cmp(lang_id(docs_mid), lang_id_oracle_sql())


def test_fingerprint_vs_oracle(spark, docs_mid):
    _cmp(fingerprint(docs_mid), fingerprint_oracle_sql())


# ---- dedup ------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Corpus with exact dups, near-dups, and distinct docs."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    rows = [
        (0, base), (1, base), (2, "  The QUICK brown fox jumps over the lazy dog again and again today "),
        (3, near), (4, "completely different text about spark query engines and indexes"),
        (5, "another unrelated document mentioning tables and rows only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, dup_docs):
    got = {(r["doc_id"], r["keep_id"]) for r in exact_duplicates(dup_docs).collect()}
    # 1 dups 0; 2 dups 0 after normalization (case+whitespace)
    assert got == {(1, 0), (2, 0)}


def test_exact_duplicates_vs_oracle(spark, docs_mid):
    _cmp(exact_duplicates(docs_mid), exact_duplicates_oracle_sql())


def test_ngram_jaccard_vs_oracle(spark, docs_mid):
    _cmp(
        ngram_jaccard_pairs(docs_mid, threshold=0.5, k=3),
        ngram_jaccard_oracle_sql(threshold=0.5, k=3),
    )


def test_ngram_jaccard_finds_near_dup(spark, dup_docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(dup_docs, threshold=0.5, k=3).collect()
    }
    assert (0, 1) in pairs and (0, 3) in pairs  # exact dup + near dup
    assert (4, 5) not in pairs


def test_minhash_lsh_superset_of_exact_high_jaccard(spark, dup_docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(dup_docs, threshold=0.7, k=3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(dup_docs, num_perm=64, bands=16, threshold=0.5).collect()
    }
    assert exact <= lsh  # high-jaccard pairs must be recalled


def test_minhash_signature_deterministic(spark, dup_docs):
    a = {tuple(r["sig"]) for r in minhash_signatures(dup_docs).collect()}
    b = {tuple(r["sig"]) for r in minhash_signatures(dup_docs.repartition(5)).collect()}
    assert a == b


def test_simhash_near_pairs(spark, dup_docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(dup_docs).collect()}
    assert sh[0] == sh[1]  # identical text -> identical simhash
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(dup_docs, max_hamming=6).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 3) in pairs  # near dup within small hamming ball
    assert (4, 5) not in pairs


# ---- similarity -------------------------------------------------------------


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _qvec():
    import numpy as np

    rng = np.random.default_rng(7)
    return [float(x) for x in rng.standard_normal(64)]


def test_cosine_topk_vs_oracle(spark, embeddings):
    q = _qvec()
    _cmp(cosine_topk(embeddings, q, k=15), cosine_topk_oracle_sql(q, k=15))


def test_cosine_pairs_vs_oracle(spark, embeddings):
    _cmp(cosine_pairs(embeddings, threshold=0.5), cosine_pairs_oracle_sql(threshold=0.5))


def test_ann_lsh_recall_on_planted_cluster(spark):
    """LSH recall is only meaningful when true neighbors exist: plant 15
    near-duplicates of the query among 300 random vectors; the approximate
    search must recover (most of) them — random background vectors are
    near-orthogonal and legitimately unrecallable."""
    import numpy as np

    rng = np.random.default_rng(11)
    q = rng.standard_normal(64)
    planted = [q + 0.15 * rng.standard_normal(64) for _ in range(15)]
    noise = [rng.standard_normal(64) for _ in range(300)]
    rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(planted + noise)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ql = [float(x) for x in q]
    exact = [r["vec_id"] for r in cosine_topk(df, ql, k=10).collect()]
    assert set(exact) <= set(range(15))  # sanity: planted dominate
    approx = [
        r["vec_id"]
        for r in ann_lsh_topk(df, ql, k=10, n_bits=12, n_probes=12).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, (recall, exact, approx)


def test_ivf_ann_vs_oracle(spark, embeddings):
    from engine.similarity import ivf_ann_topk, ivf_ann_topk_oracle_sql

    q = _qvec()
    _cmp(
        ivf_ann_topk(embeddings, q, k=15, n_cells=16, n_probes=4),
        ivf_ann_topk_oracle_sql(q, k=15, n_cells=16, n_probes=4),
    )


def test_ivf_full_probe_equals_exact(spark, embeddings):
    """n_probes == n_cells degrades IVF to brute force: every cell is
    probed, so the result must equal exact cosine_topk."""
    from engine.similarity import ivf_ann_topk

    q = _qvec()
    exact = [tuple(r) for r in cosine_topk(embeddings, q, k=10).collect()]
    full = [tuple(r) for r in
            ivf_ann_topk(embeddings, q, k=10, n_cells=8, n_probes=8).collect()]
    assert exact == full


def test_ivf_prunes_and_guards(spark, embeddings):
    from engine.similarity import ivf_ann_topk

    q = _qvec()
    # pruned probe returns a subset of the corpus ranked identically to
    # exact cosine WITHIN the probed cells (scores are exact, not approx)
    pruned = ivf_ann_topk(embeddings, q, k=1000, n_cells=16, n_probes=2)
    n_pruned = pruned.count()
    n_all = embeddings.count()
    assert 0 < n_pruned < n_all  # ~2/16 of the corpus reaches re-rank
    with pytest.raises(ValueError):
        ivf_ann_topk(embeddings, q, n_cells=8, n_probes=9)


def test_ann_lsh_pairs_vs_oracle(spark, embeddings):
    from engine.similarity import ann_lsh_pairs, ann_lsh_pairs_oracle_sql

    _cmp(
        ann_lsh_pairs(embeddings, dim=64, threshold=0.5, n_bits=16, n_bands=4),
        ann_lsh_pairs_oracle_sql(dim=64, threshold=0.5, n_bits=16, n_bands=4),
    )


def test_ann_lsh_pairs_precision_and_recall(spark):
    """Precision is exactly 1.0 (candidates are exact-verified); recall on
    planted near-dup clusters must be high (banding amplifies)."""
    import numpy as np

    from engine.similarity import ann_lsh_pairs
    from engine.similarity import cosine_pairs

    rng = np.random.default_rng(23)
    rows = []
    vid = 0
    for c in range(8):  # 8 clusters of 4 near-dups
        base = rng.standard_normal(64)
        for _ in range(4):
            v = base + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v])); vid += 1
    for _ in range(100):  # noise
        rows.append((vid, [float(x) for x in rng.standard_normal(64)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in
             cosine_pairs(df, threshold=0.95).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in
              ann_lsh_pairs(df, dim=64, threshold=0.95,
                            n_bits=16, n_bands=8).collect()}
    assert approx <= exact          # precision 1.0 by construction
    assert len(exact) >= 40         # sanity: clusters planted
    recall = len(approx) / len(exact)
    assert recall >= 0.9, recall    # 8 bands of 2 bits: near-dups collide


def test_ann_lsh_pairs_hot_bucket_cap(spark):
    """An adversarial corpus of identical vectors melts the band join
    O(n^2); the cap skips those buckets (bounded output) instead."""
    import pytest as _pytest

    from engine.similarity import ann_lsh_pairs

    rows = [(i, [1.0] * 64) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # every bucket hot -> the guard refuses rather than silently empties
    with _pytest.raises(ValueError, match="every"):
        ann_lsh_pairs(df, dim=64, threshold=0.9, max_bucket_size=50).count()
    # cap disabled -> full O(n^2) output exists (the melt-down the cap stops)
    n = ann_lsh_pairs(df, dim=64, threshold=0.9, max_bucket_size=None).count()
    assert n == 200 * 199 // 2
