"""Multi-index fan-out ingest (D11) — one batch, several indexes.

The reference's bulk builder keys requests by index: one consumed batch may
span several indexes, and each event is added to ITS index's bulk request
(/root/reference/src/main/java/org/elasticsearch/kafka/indexer/service/
ElasticSearchBatchService.java:34 — a per-(index,type) BulkRequestBuilder
map — and :57-66, addEventToBulkRequest(event, indexName, ...)); offsets are
committed only after every bulk posts (ConsumerWorker.java:117-120).

Spark-first shape: the batch window is assigned `index_name` (engine.assign,
the T2 hook), staged ONCE with `write.partitionBy(index_name)` — a single
shuffle-free job that co-locates every index's records — then each index's
staged slice runs the normal segment-build-and-commit core
(engine.ingest.process_window) against its own IndexStore. The fan-out
ledger entry (batch -> global offsets) is committed only after EVERY
per-index segment commit succeeds, mirroring the reference's
commit-after-all-bulks-succeed.

Crash anywhere: per-index `has_batch` guards make the re-run skip indexes
that already committed and rebuild the rest deterministically — nothing
lost, nothing duplicated (E1 semantics, per index).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.assign import INDEX_COL, RecordAssigner
from engine.config import DEFAULT_CONFIG, IndexConfig
from engine.ingest import BatchResult, process_window
from engine.segments import IndexStore


def _fanout_ledger_dir(root: str) -> str:
    return os.path.join(root, "_fanout_ledger")


def fanout_ledger_entries(root: str) -> list[dict]:
    d = _fanout_ledger_dir(root)
    if not os.path.isdir(d):
        return []
    import json

    out = []
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda e: e["batch_id"])


def commit_fanout_entry(root: str, batch_id: int, partition_offsets: dict) -> None:
    from engine.segments import _atomic_write_json

    _atomic_write_json(
        os.path.join(_fanout_ledger_dir(root), f"{batch_id:010d}.json"),
        {"batch_id": batch_id, "partition_offsets": partition_offsets},
    )


def fanout_offsets(root: str) -> dict[int, int]:
    """Global per-partition high-water marks from the FANOUT ledger — which
    is committed only after every per-index segment commit succeeded (the
    reference's commit-offsets-after-all-bulks-post,
    ConsumerWorker.java:117-120). A batch where only some indexes committed
    is NOT in this ledger, so the re-run re-delivers the whole window and
    the per-index `has_batch` guards skip the already-durable parts."""
    hwm: dict[int, int] = {}
    for e in fanout_ledger_entries(root):
        for p, o in e["partition_offsets"].items():
            p = int(p)
            hwm[p] = max(hwm.get(p, -1), int(o))
    return hwm


def discover_indexes(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root)
        if os.path.exists(os.path.join(root, d, "_meta.json"))
    )


def next_fanout_batch_id(root: str) -> int:
    """1 + the last FULLY-committed batch (fanout ledger). A batch whose
    per-index commits only partially landed keeps its id, so the re-run
    completes it under the same deterministic segment ids."""
    entries = fanout_ledger_entries(root)
    return (entries[-1]["batch_id"] + 1) if entries else 0


def fanout_process_window(
    spark: SparkSession,
    root: str,
    window: DataFrame,
    batch_id: int,
    assigner: RecordAssigner,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> dict[str, BatchResult]:
    """Assign + stage + per-index segment build for one batch window.

    Returns {index_name: BatchResult} for indexes that received records.
    """
    assigned = assigner.assign(window)
    staging = os.path.join(root, "_staging", f"batch-{batch_id:08d}")
    shutil.rmtree(staging, ignore_errors=True)
    # ONE job stages the whole batch, hive-partitioned by index: each
    # index's build then reads only its own files (no per-index re-scan of
    # the source, no shuffle — partitionBy writes are map-side)
    assigned.write.mode("overwrite").partitionBy(INDEX_COL).parquet(staging)

    results: dict[str, BatchResult] = {}
    try:
        prefix = f"{INDEX_COL}="
        names = sorted(
            d[len(prefix):] for d in os.listdir(staging) if d.startswith(prefix)
        )
        for name in names:
            store = IndexStore(root, name, cfg)
            if not store.exists():
                store.create()
            if store.has_batch(batch_id):
                continue  # re-run after partial crash: this index is done
            win = spark.read.parquet(os.path.join(staging, f"{prefix}{name}"))
            res = process_window(spark, store, win, batch_id, cfg=cfg)
            if res is not None:
                results[name] = res
        return results
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def run_fanout_loop(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    rows_per_partition: int,
    assigner: RecordAssigner,
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_batches: int | None = None,
) -> list[dict[str, BatchResult]]:
    """The poll loop over a multi-index assignment: slice the next offset
    window above the GLOBAL high-water mark (max over all indexes), fan out,
    repeat until drained. Restart-safe: offsets are re-derived from the
    per-index ledgers each iteration."""
    out: list[dict[str, BatchResult]] = []
    while max_batches is None or len(out) < max_batches:
        hwm = fanout_offsets(root)
        batch_id = next_fanout_batch_id(root)
        hwm_df = spark.createDataFrame(
            [(int(p), int(o)) for p, o in hwm.items()] or [(-1, -1)],
            "part_id int, committed long",
        )
        window = (
            source.join(F.broadcast(hwm_df), "part_id", "left")
            .where(
                (F.col("row_offset") > F.coalesce(F.col("committed"), F.lit(-1)))
                & (
                    F.col("row_offset")
                    <= F.coalesce(F.col("committed"), F.lit(-1)) + rows_per_partition
                )
            )
            .drop("committed")
        )
        res = fanout_process_window(spark, root, window, batch_id, assigner, cfg)
        # batch offsets = per-partition max over every index's commit for
        # THIS batch (skipped-because-already-done indexes included)
        offs: dict[str, int] = {}
        for name in discover_indexes(root):
            for e in IndexStore(root, name).ledger_entries():
                if e.kind == "ingest" and e.metrics.get("batch_id") == batch_id:
                    for p, o in e.partition_offsets.items():
                        offs[p] = max(offs.get(p, -1), int(o))
        if not offs:
            break  # empty window everywhere: source drained (S6)
        # commit-after-ALL-success: the fanout entry lands only here
        commit_fanout_entry(root, batch_id, offs)
        if res:
            out.append(res)
    return out
