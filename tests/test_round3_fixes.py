"""Round-3 regression tests: ADVICE r02 fixes + the store-build fast paths.

Covers
- fanout re-run after a partial crash with a CHANGED rows_per_partition
  (window bounds now pinned by the batch manifest — ADVICE r02 #2)
- _best_of folds only same-corpus-size trials (ADVICE r02 #1)
- simhash_near_pairs at max_hamming=0 (LongType overflow — ADVICE r02 #4)
- routed posting build over empty input (zero-row Arrow batch guard —
  ADVICE r02 #3)
- the vectorized long-form re-encoder (build_posting_blocks) round-trips
  routed postings identically to the local builder
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.corpus import webpages
from engine.ingest import EARLIEST, as_partitioned_source
from engine.segments import IndexStore

N = 200


@pytest.fixture(scope="module")
def src(spark):
    return as_partitioned_source(webpages(spark, N, partitions=2), 2).cache()


def test_fanout_rerun_with_larger_window_no_loss(spark, src, tmp_path):
    """Crash after index A committed batch 0 (window recorded as
    rows_per_partition=50 in the batch manifest), restart the loop with
    rows_per_partition=80: the re-run MUST replay the 50-row window (from
    the manifest), not an 80-row one — otherwise A silently loses the rows
    in (50, 80] while the fanout ledger advances past them."""
    from engine.fanout import (
        discover_indexes,
        fanout_offsets,
        run_fanout_loop,
        write_batch_manifest,
    )
    from engine.ingest import process_window

    def lang_assigner():
        from engine.assign import RecordAssigner

        return RecordAssigner(
            index_name=lambda df: F.when(
                F.col("lang") == "en", "idx_en"
            ).otherwise("idx_other")
        )

    root = str(tmp_path / "crash_resize")
    # simulate the crashed run: manifest written (rpp=50, empty hwm), then
    # idx_en committed its slice of the 50-row window, then death
    write_batch_manifest(root, 0, 50, {})
    window = src.where(F.col("row_offset") < 50)
    en_store = IndexStore(root, "idx_en").create()
    process_window(spark, en_store, window.where(F.col("lang") == "en"), batch_id=0)
    assert en_store.has_batch(0)
    assert fanout_offsets(root) == {}

    # restart with a LARGER window size
    run_fanout_loop(spark, root, src, rows_per_partition=80, assigner=lang_assigner())

    # drained: every partition's full offset range committed
    assert fanout_offsets(root) == {p: N // 2 - 1 for p in range(2)}
    # no loss: distinct urls across both indexes == N minus the quarantined
    # bad-html doc and the dup url (same accounting as the drain test)
    names = discover_indexes(root)
    assert names == ["idx_en", "idx_other"]
    dfs = [IndexStore(root, n).docs(spark).select("url") for n in names]
    all_urls = dfs[0].union(dfs[1])
    assert all_urls.distinct().count() == N - 2
    # idx_en was not rebuilt for batch 0
    assert len([
        e for e in IndexStore(root, "idx_en").ledger_entries() if e.kind == "ingest"
        and e.metrics.get("batch_id") == 0
    ]) == 1


def test_best_of_ignores_offsize_trials():
    # bench.py at the repo root shadows the bench/ dir — load by path
    import importlib.util
    import os

    p = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench", "scaling.py")
    spec = importlib.util.spec_from_file_location("bench_scaling", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _best_of = mod._best_of

    mk = lambda cores, docs, dps, mode="strong": {
        "mode": mode, "cores": cores, "docs": docs, "docs_per_sec": dps,
        "n_docs": docs, "build_sec": 1.0,
        "q_exact_p50_ms": 1, "q_exact_p99_ms": 1,
        "q_wand_p50_ms": 1, "q_wand_p99_ms": 1,
    }
    trials = [
        mk(8, 200_000, 100.0),
        mk(8, 200_000, 120.0),
        mk(8, 50_000, 900.0),      # off-size: must NOT win the cell
        mk(32, 200_000, 300.0),
        # weak mode: docs-per-core is the comparable size
        mk(8, 100_000, 80.0, "weak"),    # 12_500/core
        mk(32, 400_000, 300.0, "weak"),  # 12_500/core
        mk(8, 16_000, 999.0, "weak"),    # 2_000/core off-size
    ]
    reports, n_trials = _best_of(trials)
    assert reports[("strong", 8)]["docs_per_sec"] == 120.0
    assert reports[("strong", 32)]["docs_per_sec"] == 300.0
    assert reports[("weak", 8)]["docs_per_sec"] == 80.0
    assert n_trials[("strong", 8)] == 2  # off-size trial not counted


def test_simhash_radius_zero(spark):
    """max_hamming=0 == exact-simhash duplicates; used to overflow LongType
    via F.lit((1<<64)-1) on the single full-word band."""
    from engine.dedup import simhash_near_pairs

    fp = spark.createDataFrame(
        [(1, 42), (2, 42), (3, 43), (4, -7), (5, -7)],
        "doc_id long, simhash long",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(
            spark.range(0), max_hamming=0, fingerprints=fp
        ).collect()
    )
    assert got == [(1, 2, 0), (4, 5, 0)]


def test_routed_build_empty_input(spark):
    from engine.postings import build_posting_blocks_local

    docs = (
        webpages(spark, 20, partitions=2)
        .withColumn("doc_id", F.col("row_id"))
        .where(F.col("doc_id") < 0)
    )
    blocks = build_posting_blocks_local(docs, routing_col="lang")
    assert blocks.count() == 0


def test_longform_reencoder_matches_local_builder(spark):
    """The merge path's vectorized re-encoder produces byte-equivalent
    decoded postings (incl. routing) to the local builder's output."""
    from engine.postings import (
        build_posting_blocks,
        build_posting_blocks_local,
        decode_postings,
    )

    docs = webpages(spark, 100, partitions=4).withColumn("doc_id", F.col("row_id"))
    local = build_posting_blocks_local(docs, routing_col="lang")
    long_form = decode_postings(local)
    # re-attach routing (decode drops nothing; routed blocks carry it)
    assert "routing" in local.columns
    routed_long = decode_postings(local).join(
        docs.select("doc_id", F.col("lang").cast("string").alias("routing")),
        "doc_id",
    )
    re_encoded = build_posting_blocks(routed_long, 100)
    a = sorted(
        (r["routing"], r["term"], r["doc_id"], r["tf"], r["dl"])
        for r in decode_postings(re_encoded)
        .join(docs.select("doc_id", F.col("lang").cast("string").alias("routing")), "doc_id")
        .collect()
    )
    b = sorted(
        (r["routing"], r["term"], r["doc_id"], r["tf"], r["dl"])
        for r in routed_long.collect()
    )
    assert a == b
    # blocks are routing-pure: every block's routing matches its docs' lang
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    for r in re_encoded.select("routing", "min_doc", "max_doc").collect():
        assert langs[r["min_doc"]] == r["routing"]
        assert langs[r["max_doc"]] == r["routing"]
