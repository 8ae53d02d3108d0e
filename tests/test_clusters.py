"""connected_components / dedup_clusters semantics.

Key properties beyond the driver's oracle hash:
- components are exact on hand-built graphs (two components + singleton)
- cluster_id is the component MIN id (deterministic canonical choice)
- pointer jumping converges in O(log diameter): a 100-node chain resolves
  within 10 iterations, where one-hop-only propagation would need 99 —
  the property that makes the operator safe on a pathological
  templated-page chain at corpus scale
- empty pairs -> every doc is its own singleton cluster
"""

from __future__ import annotations

import pytest

from engine.clusters import connected_components, dedup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )


def test_two_components_and_min_label(spark):
    # component {1,2,3,7} (7 via 3) and {10,11}; 99 absent from pairs
    pairs = _pairs(spark, [(2, 1), (2, 3), (3, 7), (10, 11)])
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_chain_converges_logarithmically(spark):
    # path 0-1-2-...-99: diameter 99. One-hop min-label propagation needs
    # 99 iterations; with the pointer-jump step 10 suffice (2^10 >> 99).
    chain = _pairs(spark, [(i, i + 1) for i in range(99)])
    got = connected_components(chain, max_iter=10).collect()
    assert len(got) == 100
    assert {r["cluster_id"] for r in got} == {0}


def test_nonconvergence_raises(spark):
    chain = _pairs(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)


def test_dedup_clusters_singletons_and_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = _pairs(spark, [(4, 2), (2, 0)])
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        0: 0, 1: 1, 2: 0, 3: 3, 4: 0, 5: 5,
    }
    canon = {d for d, r in rows.items() if r["is_canonical"]}
    assert canon == {0, 1, 3, 5}
    # empty pairs: everything canonical
    empty = _pairs(spark, [])
    rows2 = dedup_clusters(docs, empty).collect()
    assert all(r["is_canonical"] and r["cluster_id"] == r["doc_id"] for r in rows2)


# ---- round-5 continuation: k-means (SemDeDup cluster path) ----


def test_kmeans_recovers_planted_clusters(spark):
    # synthetic well-separated clusters (the sf embeddings' label column is
    # NOT geometric: same-label pairs average cosine ~0, verified) — plant
    # three tight blobs and require exact recovery
    import random

    from pyspark.sql import Row

    from engine.similarity import kmeans_assign

    rng = random.Random(7)
    rows = []
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    for i in range(90):
        c = centers[i % 3]
        rows.append(Row(
            vec_id=i,
            embedding=[x + rng.uniform(-0.5, 0.5) for x in c],
            planted=i % 3,
        ))
    df = spark.createDataFrame(rows)
    out = kmeans_assign(spark, df, k=3, n_iters=4)
    joined = {r.vec_id: r.cluster for r in out.collect()}
    # each planted blob maps to exactly one k-means cluster (bijection)
    mapping = {}
    for i in range(90):
        mapping.setdefault(i % 3, set()).add(joined[i])
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 3


def test_kmeans_deterministic_across_parallelism(spark):
    from engine.similarity import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_assign(spark, emb.repartition(2), k=6, n_iters=2).collect()
    b = kmeans_assign(spark, emb.repartition(7), k=6, n_iters=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from pyspark.sql import Row

    from engine.similarity import kmeans_assign

    # 3 identical far vectors + k=2: cluster 1's centroid (the second
    # init vector) wins all points after iter 1; cluster 0 empties and
    # must keep its init centroid without error
    rows = [Row(vec_id=i, embedding=[float(i == 0), 1.0, 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows)
    out = kmeans_assign(spark, df, k=2, n_iters=3).collect()
    assert len(out) == 3


def test_semdedup_subset_of_bruteforce_with_recall(spark):
    from engine.similarity import cosine_pairs, semdedup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    blocked = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(spark, emb, threshold=0.35, k=10,
                                n_iters=2).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in cosine_pairs(emb, threshold=0.35).collect()
    }
    assert blocked <= full
    # k-means blocking on a weakly-clustered table keeps only same-cluster
    # pairs; report recall and require it non-degenerate
    assert full and len(blocked) / len(full) > 0.05
