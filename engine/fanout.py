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


def _manifest_path(root: str, batch_id: int) -> str:
    return os.path.join(root, "_fanout_manifests", f"{batch_id:010d}.json")


def write_batch_manifest(
    root: str, batch_id: int, rows_per_partition: int, hwm: dict
) -> None:
    """Record the batch WINDOW BOUNDS before any per-index commit. A re-run
    after a partial crash re-derives the window from this manifest, not from
    the caller's current rows_per_partition — otherwise restarting with a
    larger window would make already-committed indexes silently skip the
    extra rows while the fanout entry advances past them (ADVICE r02)."""
    from engine.segments import _atomic_write_json

    _atomic_write_json(
        _manifest_path(root, batch_id),
        {
            "batch_id": batch_id,
            "rows_per_partition": int(rows_per_partition),
            "hwm": {str(p): int(o) for p, o in hwm.items()},
        },
    )


def read_batch_manifest(root: str, batch_id: int) -> dict | None:
    import json

    p = _manifest_path(root, batch_id)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def clear_batch_manifest(root: str, batch_id: int) -> None:
    try:
        os.remove(_manifest_path(root, batch_id))
    except FileNotFoundError:
        pass


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
    from engine.analysis import with_extracted_text

    assigned = assigner.assign(window)
    results: dict[str, BatchResult] = {}

    # cheap pre-pass (column-pruned: reads only the assignment inputs, never
    # html): which indexes does this batch touch? A single-index batch skips
    # staging entirely — the window flows straight into the normal build
    names = sorted(
        r[0] for r in assigned.select(INDEX_COL).distinct().collect()
    )
    if not names:
        return results
    if len(names) == 1:
        name = names[0]
        store = IndexStore(root, name, cfg)
        if not store.exists():
            store.create()
        if store.has_batch(batch_id):
            return results
        res = process_window(spark, store, assigned.drop(INDEX_COL), batch_id, cfg=cfg)
        if res is not None:
            results[name] = res
        return results

    staging = os.path.join(root, "_staging", f"batch-{batch_id:08d}")
    shutil.rmtree(staging, ignore_errors=True)
    # ONE map-side job extracts AND stages the whole batch, hive-partitioned
    # by index: each index's build then reads only its own (already
    # extracted) files. The raw html — the bulk of the batch bytes — is NOT
    # staged: extraction runs once here instead of once per index, and only
    # quarantine-bound rows keep their payload (an all-null binary column
    # costs ~nothing in parquet).
    ext = with_extracted_text(assigned)
    stage_df = ext.withColumn(
        "payload", F.when(F.col("extract_error").isNotNull(), F.col("html"))
    ).drop("html")
    stage_df.write.mode("overwrite").partitionBy(INDEX_COL).parquet(staging)

    try:
        prefix = f"{INDEX_COL}="
        staged = sorted(
            d[len(prefix):] for d in os.listdir(staging) if d.startswith(prefix)
        )
        for name in staged:
            store = IndexStore(root, name, cfg)
            if not store.exists():
                store.create()
            if store.has_batch(batch_id):
                continue  # re-run after partial crash: this index is done
            win = spark.read.parquet(os.path.join(staging, f"{prefix}{name}"))
            res = process_window(
                spark, store, win, batch_id, cfg=cfg, pre_extracted=True
            )
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
    first_batch_id = next_fanout_batch_id(root)
    # sweep orphaned manifests from batches that committed but crashed
    # before their clear_batch_manifest (ADVICE r03): anything below the
    # next batch id is fully committed and will never be read again — and
    # if the fanout ledger were ever reset, a stale manifest would pin the
    # new batch 0 to the old window bounds
    mdir = os.path.join(root, "_fanout_manifests")
    if os.path.isdir(mdir):
        for fname in os.listdir(mdir):
            if fname.endswith(".json") and int(fname[:-5]) < first_batch_id:
                clear_batch_manifest(root, int(fname[:-5]))
    while max_batches is None or len(out) < max_batches:
        batch_id = next_fanout_batch_id(root)
        # window bounds come from the batch manifest when one exists (a
        # re-run after a partial crash MUST replay the exact crashed window,
        # whatever rows_per_partition the caller passes now); a fresh batch
        # records its bounds before any per-index commit can land
        man = read_batch_manifest(root, batch_id)
        if man is not None:
            hwm = {int(p): int(o) for p, o in man["hwm"].items()}
            rpp = int(man["rows_per_partition"])
        else:
            hwm = fanout_offsets(root)
            rpp = rows_per_partition
            write_batch_manifest(root, batch_id, rpp, hwm)
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
                    <= F.coalesce(F.col("committed"), F.lit(-1)) + rpp
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
            # empty window everywhere: source drained (S6). Drop the
            # manifest so a later restart (source grown, new window size)
            # is not pinned to this empty batch's recorded bounds.
            clear_batch_manifest(root, batch_id)
            break
        # commit-after-ALL-success: the fanout entry lands only here
        commit_fanout_entry(root, batch_id, offs)
        clear_batch_manifest(root, batch_id)
        if res:
            out.append(res)
    return out
