"""Round-2 fixes: simhash banding recall, tiered merge policy, alias
machinery (S9-S11), deleted-set overflow fallback, lazy reader term stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.config import IndexConfig
from engine.corpus import webpages
from engine.dedup import simhash_bands, simhash_near_pairs
from engine.ingest import EARLIEST, as_partitioned_source, run_ingest_loop
from engine.merge import maybe_merge, select_merge_tier
from engine.query import IndexReader, search_store
from engine.segments import IndexStore
from engine.wand import search_store_wand

# ---------------------------------------------------------------------------
# simhash banding: recall 1.0 at ANY radius (the round-1 bug: 4 fixed bands
# only guaranteed hamming <= 3 while the driver called with max_hamming=10)
# ---------------------------------------------------------------------------


def test_simhash_bands_cover_64_bits():
    for h in [0, 1, 3, 10, 31, 63]:
        bands = simhash_bands(h)
        assert len(bands) == h + 1
        assert sum(w for _, w in bands) == 64
        # contiguous, non-overlapping
        pos = 0
        for off, w in bands:
            assert off == pos and w >= 1
            pos += w
        assert pos == 64


@pytest.mark.parametrize("radius", [3, 8, 10])
def test_simhash_recall_at_radius(spark, radius):
    """Plant pairs at exact hamming distances 1..12; blocking at max_hamming
    must find EVERY pair at distance <= max_hamming (pigeonhole guarantee)."""
    rng = np.random.default_rng(42)
    rows, expected = [], set()
    next_id = 0
    for h in range(1, 13):
        base = int(rng.integers(0, 2**63, dtype=np.int64))
        flip = rng.choice(64, size=h, replace=False)
        other = base
        for b in flip:
            other ^= 1 << int(b)
        # re-interpret as signed 64-bit
        other = int(np.int64(np.uint64(other & (2**64 - 1))))
        rows.append((next_id, base))
        rows.append((next_id + 1, other))
        if h <= radius:
            expected.add((next_id, next_id + 1))
        next_id += 2
    fp = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            None, max_hamming=radius, fingerprints=fp
        ).collect()
    }
    # every planted pair within the radius is found (recall 1.0)...
    assert expected <= got
    # ...and no PLANTED pair beyond the radius is reported (the hamming
    # verify filter); cross-plant pairs could collide by chance and are fine
    planted_found = {(a, b) for a, b in got if b == a + 1 and a % 2 == 0}
    assert planted_found == expected


# ---------------------------------------------------------------------------
# tiered merge policy: per-merge input bounded by merge_factor
# ---------------------------------------------------------------------------


def test_tiered_merge_bounds_inputs(spark, tmp_path):
    src = as_partitioned_source(webpages(spark, 120, partitions=2), 2)
    store = IndexStore(str(tmp_path), "tiered").create()
    # 12 tiny batches of ~10 docs; merge_factor=4
    run_ingest_loop(spark, store, src, rows_per_partition=5, start_option=EARLIEST)
    assert len([e for e in store.ledger_entries() if e.kind == "ingest"]) == 12
    while True:
        out = maybe_merge(spark, store, merge_factor=4)
        if out is None:
            break
    merges = [e for e in store.ledger_entries() if e.kind == "merge"]
    assert merges, "expected at least one merge"
    for e in merges:
        assert 2 <= len(e.segments_removed) <= 4  # bounded input count
    # merged index answers identically to a fresh single-batch rebuild
    ref = IndexStore(str(tmp_path), "ref").create()
    run_ingest_loop(spark, ref, src, rows_per_partition=60, start_option=EARLIEST)
    for terms in [["engine", "spark"], ["crawl"]]:
        a = [r["score"] for r in search_store(spark, store, terms, k=10).collect()]
        b = [r["score"] for r in search_store(spark, ref, terms, k=10).collect()]
        assert a == b, terms


def test_select_merge_tier_prefers_smallest_tier(tmp_path):
    """Unit-level: tier selection picks the smallest over-full size band."""
    store = IndexStore(str(tmp_path), "sel").create()

    # fake segments by writing stats.json directly
    import json
    import os

    def fake_seg(sid, n_docs):
        p = store.segment_path(sid)
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, "stats.json"), "w") as f:
            json.dump({"n_docs": n_docs, "sum_dl": n_docs * 10,
                       "base_doc_id": 0, "doc_id_hwm": 0}, f)

    from engine.segments import LedgerEntry

    small = [f"s{i}" for i in range(4)]
    big = [f"b{i}" for i in range(4)]
    for s in small:
        fake_seg(s, 10)
    for s in big:
        fake_seg(s, 10_000)
    store.commit(LedgerEntry(entry_id=0, kind="ingest", segments_added=small + big))
    sel = select_merge_tier(store, merge_factor=4)
    assert sel is not None and set(sel) <= set(small)


# ---------------------------------------------------------------------------
# alias machinery S9-S11 (round 1: zero coverage)
# ---------------------------------------------------------------------------


@pytest.fixture()
def alias_store(spark, tmp_path):
    src = as_partitioned_source(webpages(spark, 100, partitions=2), 2)
    store = IndexStore(str(tmp_path), "aliased").create()
    run_ingest_loop(spark, store, src, rows_per_partition=50, start_option=EARLIEST)
    return store


def test_plain_alias_reads_all_docs(spark, alias_store):
    alias_store.add_alias("all_docs")
    n_direct = alias_store.docs(spark).count()
    assert alias_store.docs_via_alias(spark, "all_docs").count() == n_direct


def test_filtered_alias_applies_predicate(spark, alias_store):
    alias_store.add_alias("en_docs", filter_col="lang", filter_val="en")
    via = alias_store.docs_via_alias(spark, "en_docs")
    direct = alias_store.docs(spark).where(F.col("lang") == "en")
    assert via.count() == direct.count() > 0
    assert {r["lang"] for r in via.select("lang").distinct().collect()} == {"en"}


def test_alias_unknown_raises(alias_store, spark):
    with pytest.raises(KeyError):
        alias_store.docs_via_alias(spark, "nope")


# ---------------------------------------------------------------------------
# persisted ANN index: same recall as the ad hoc path, pruned probe scans
# ---------------------------------------------------------------------------


def test_ann_index_persisted_matches_adhoc_and_prunes(spark, tmp_path):
    import numpy as np

    from engine.similarity import AnnIndex, ann_lsh_topk, cosine_topk

    rng = np.random.default_rng(11)
    q = rng.standard_normal(64)
    planted = [q + 0.15 * rng.standard_normal(64) for _ in range(15)]
    noise = [rng.standard_normal(64) for _ in range(300)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(planted + noise)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ql = [float(x) for x in q]

    idx = AnnIndex.build(df, str(tmp_path / "ann"), dim=64, n_bits=12, n_groups=16)
    got = [(r["vec_id"], r["cosine"]) for r in idx.topk(spark, ql, k=10, n_probes=12).collect()]
    adhoc = [
        (r["vec_id"], r["cosine"])
        for r in ann_lsh_topk(df, ql, k=10, n_bits=12, n_probes=12).collect()
    ]
    assert got == adhoc  # identical planes + buckets -> identical candidates

    exact = [r["vec_id"] for r in cosine_topk(df, ql, k=10).collect()]
    recall = len(set(exact) & {v for v, _ in got}) / 10
    assert recall >= 0.7

    # reopen from disk; probe plan prunes bucket_grp partitions
    idx2 = AnnIndex.open(spark, str(tmp_path / "ann"))
    assert (idx2.dim, idx2.n_bits, idx2.n_groups) == (64, 12, 16)
    plan = (
        spark.read.parquet(idx2.path)
        .where(F.col("bucket_grp").cast("int").isin([1, 2]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


# ---------------------------------------------------------------------------
# E3 graceful shutdown: finish-current-batch-then-stop
# ---------------------------------------------------------------------------


def test_stop_requested_drains_after_current_batch(spark, tmp_path):
    src = as_partitioned_source(webpages(spark, 100, partitions=2), 2)
    store = IndexStore(str(tmp_path), "drain").create()
    calls = {"n": 0}

    def stop_after_two_checks() -> bool:
        calls["n"] += 1
        return calls["n"] > 2  # batches 1 and 2 run; check 3 stops the loop

    results = run_ingest_loop(
        spark, store, src, rows_per_partition=10, start_option=EARLIEST,
        stop_requested=stop_after_two_checks,
    )
    assert len(results) == 2
    assert all(r.committed for r in results)  # in-flight batches completed
    # ledger is clean: a restart resumes exactly where the drain stopped
    rest = run_ingest_loop(spark, store, src, rows_per_partition=10)
    assert len(rest) == 3  # 100/2/10 = 5 total windows
    urls = [r["url"] for r in store.docs(spark).select("url").collect()]
    assert len(urls) == len(set(urls))


def test_cli_sigterm_graceful(tmp_path):
    """Kill-during-loop: SIGTERM mid-run leaves a consistent ledger and the
    process reports a graceful drain (or finished first on a fast machine)."""
    import json
    import signal
    import subprocess
    import sys
    import time

    root = str(tmp_path / "idx")
    p = subprocess.Popen(
        [sys.executable, "jobs/build_index.py", "--index-root", root,
         "--index", "web", "--docs", "12000", "--source-partitions", "4",
         "--rows-per-partition", "200", "--start", "EARLIEST"],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    # wait for the first ledger commit, then signal
    deadline = time.time() + 180
    store = IndexStore(root, "web")
    while time.time() < deadline and not store.ledger_entries():
        time.sleep(1)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    entries = store.ledger_entries()
    assert entries, "at least one batch committed before the drain"
    # every committed entry is complete (segment dir + offsets present)
    import os

    for e in entries:
        if e.kind != "ingest":
            continue
        assert e.partition_offsets
        for s in e.segments_added:
            assert os.path.exists(os.path.join(store.segment_path(s), "stats.json"))
    # either drained gracefully or the tiny corpus finished first
    assert any("stopped" in l or "committed_offsets" in l for l in lines)


# ---------------------------------------------------------------------------
# deleted-set overflow: WAND falls back to the distributed exact path
# ---------------------------------------------------------------------------


def test_wand_deleted_overflow_fallback(spark, tmp_path):
    # two batches with an overlapping url -> superseded docs exist
    src = as_partitioned_source(webpages(spark, 80, partitions=2), 2)
    store = IndexStore(str(tmp_path), "ovf").create()
    run_ingest_loop(spark, store, src, rows_per_partition=20, start_option=EARLIEST)
    assert len(store.live_segments()) > 1
    terms = ["engine", "spark"]
    want = [
        (r["doc_id"], r["score"])
        for r in search_store(spark, store, terms, k=10).collect()
    ]
    tiny = IndexConfig(max_deleted_driver=0)  # force the fallback
    got = [
        (r["doc_id"], r["score"])
        for r in search_store_wand(spark, store, terms, k=10, cfg=tiny).collect()
    ]
    assert got == want
    reader = IndexReader(spark, store, cfg=tiny)
    try:
        got_r = [
            (r["doc_id"], r["score"])
            for r in reader.search_wand(terms, k=10).collect()
        ]
        assert got_r == want
        # lazy term stats: memo populated only with queried terms
        assert set(reader._df_memo) <= set(terms) | {"warmup"}
    finally:
        reader.close()
