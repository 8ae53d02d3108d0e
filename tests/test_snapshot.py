"""ES _snapshot/_restore (engine/snapshot.py): incremental repository
snapshots of immutable segments, restore into a new index with offsets
replayed.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engine.config import IndexConfig
from engine.corpus import webpages
from engine.ingest import EARLIEST, as_partitioned_source, run_ingest_loop
from engine.query import search_store
from engine.segments import IndexStore
from engine.snapshot import list_snapshots, restore, snapshot

N, P = 150, 4
TERMS = ["the", "data", "spark"]


@pytest.fixture(scope="module")
def source(spark):
    return as_partitioned_source(webpages(spark, N, partitions=4), P).cache()


@pytest.fixture(scope="module")
def store(spark, source, tmp_path_factory):
    st = IndexStore(
        str(tmp_path_factory.mktemp("snap_src")), "snap_idx"
    ).create()
    run_ingest_loop(spark, st, source.where(F.col("row_offset") < 20),
                    rows_per_partition=20, start_option=EARLIEST)
    return st


def test_snapshot_restore_identical_results(spark, store, tmp_path):
    repo = str(tmp_path / "repo")
    m = snapshot(store, repo, "snap1")
    assert m["segments"] and m["segments_copied"] == m["segments"]
    restored = restore(repo, "snap1", str(tmp_path / "out"))
    a = [tuple(r) for r in search_store(spark, store, TERMS, k=10).collect()]
    b = [tuple(r) for r in search_store(spark, restored, TERMS, k=10).collect()]
    assert a == b and len(a) > 0
    # offsets replayed: a resumed ingest loop starts from the snapshot point
    assert restored.committed_offsets() == store.committed_offsets()
    assert list_snapshots(repo) == ["snap1"]


def test_snapshot_is_incremental(spark, store, source, tmp_path):
    repo = str(tmp_path / "repo")
    snapshot(store, repo, "s1")
    # grow the index, snapshot again: only the NEW segment is copied
    run_ingest_loop(spark, store, source, rows_per_partition=40)
    m2 = snapshot(store, repo, "s2")
    assert m2["segments_shared"]  # old segments reused from the pool
    assert m2["segments_copied"]  # the new one copied
    assert set(m2["segments"]) == set(m2["segments_shared"]) | set(
        m2["segments_copied"]
    )
    # both snapshots restorable; s2 sees the grown corpus
    r1 = restore(repo, "s1", str(tmp_path / "o1"), "idx1")
    r2 = restore(repo, "s2", str(tmp_path / "o2"), "idx2")
    n1 = r1.docs(spark).count()
    n2 = r2.docs(spark).count()
    assert n1 < n2


def test_snapshot_restore_guards(spark, store, tmp_path):
    repo = str(tmp_path / "repo")
    snapshot(store, repo, "g1")
    with pytest.raises(ValueError, match="already exists"):
        snapshot(store, repo, "g1")
    with pytest.raises(ValueError, match="not found"):
        restore(repo, "nope", str(tmp_path / "o"))
    restore(repo, "g1", str(tmp_path / "o"), "tgt")
    with pytest.raises(ValueError, match="already exists"):
        restore(repo, "g1", str(tmp_path / "o"), "tgt")


def test_resume_ingest_after_restore(spark, source, tmp_path):
    """The reference's offset-commit semantics through backup/restore: a
    loop resumed on the restored index ingests only rows past the
    snapshot's committed offsets. (Own store — the shared fixture store is
    grown to the full corpus by the incremental test.)"""
    store = IndexStore(str(tmp_path / "src"), "snap_idx").create()
    run_ingest_loop(spark, store, source.where(F.col("row_offset") < 20),
                    rows_per_partition=20, start_option=EARLIEST)
    repo = str(tmp_path / "repo")
    snapshot(store, repo, "r1")
    restored = restore(repo, "r1", str(tmp_path / "o"))
    before = restored.docs(spark).count()
    hwm = restored.committed_offsets()
    results = run_ingest_loop(spark, restored, source, rows_per_partition=10**6)
    ingested = sum(r.n_docs for r in results if r)
    total = restored.docs(spark).count()
    # only the remainder of the corpus arrives (no re-ingest of snapshot rows)
    assert before > 0 and ingested > 0
    assert total == before + ingested
    # exactly the rows past the snapshot's committed offsets, url-deduped
    # (one bulk batch), were ingested
    import functools

    cond = functools.reduce(
        lambda a, b: a | b,
        [
            (F.col("part_id") == p) & (F.col("row_offset") > o)
            for p, o in hwm.items()
        ],
    )
    expected = source.where(cond).select("url").distinct().count()
    assert ingested == expected
