"""Structured Streaming twin of the micro-ingest loop (SURVEY.md §2.1 S1).

The reference's hot path is a bounded poll loop, not an event-time stream
(/root/reference/src/main/java/org/elasticsearch/kafka/indexer/jobs/
ConsumerWorker.java:50-143), so the batch loop in engine.ingest is the
primary semantic. This module is the `readStream` twin the same pipeline
gets on a live source: file-stream (or Kafka, on a real cluster) micro-
batches, each processed by the SAME segment-build-and-commit core
(engine.ingest.process_window) inside `foreachBatch`.

Streaming <-> reference mapping:
  - `maxFilesPerTrigger` bounds a micro-batch the way the reference's
    per-partition fetch cap bounds a poll (ConsumerManager.java:52-55).
  - Spark's streaming checkpoint tracks which source files were consumed
    (the Kafka offset analog); OUR ledger additionally records the epoch ->
    segment mapping, so a replayed epoch (foreachBatch is at-least-once)
    is detected and skipped — commit-after-success end to end
    (ConsumerWorker.java:117-120).
  - No watermarks/event-time state: identical to the reference (wall-clock
    only, SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from engine.config import DEFAULT_CONFIG, IndexConfig
from engine.corpus import CORPUS_SCHEMA
from engine.ingest import BatchResult, process_window
from engine.segments import IndexStore


def committed_epochs(store: IndexStore) -> set[int]:
    """Epoch ids already in the ledger — the idempotency guard's state.
    Read once per stream start (a restart reconstructs it from the ledger);
    the running stream appends in-memory, so the guard is O(1) per batch
    instead of re-parsing every ledger file each micro-batch."""
    return {
        int(e.metrics["epoch_id"])
        for e in store.ledger_entries()
        if e.kind == "ingest" and e.metrics.get("epoch_id") is not None
    }


def epoch_already_committed(store: IndexStore, epoch_id: int) -> bool:
    """Idempotency guard: foreachBatch may replay an epoch after a crash
    between our ledger commit and Spark's checkpoint write."""
    return epoch_id in committed_epochs(store)


def stream_ingest(
    spark: SparkSession,
    store: IndexStore,
    source_dir: str,
    checkpoint_dir: str,
    schema: str = CORPUS_SCHEMA,
    num_partitions: int = 4,
    max_files_per_trigger: int | None = 1,
    cfg: IndexConfig = DEFAULT_CONFIG,
    results: list[BatchResult] | None = None,
):
    """Drain `source_dir` (parquet file stream) into the index, one committed
    segment per micro-batch; returns after all currently-available input is
    processed (`trigger(availableNow=True)`).

    Restarting with the same `checkpoint_dir` resumes exactly where the
    stream left off — the streaming RESTART semantic (S2). `results`, if
    given, collects per-epoch BatchResults (driver-side, test hook).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    pages = reader.parquet(source_dir)

    from engine.ingest import as_partitioned_source

    committed = committed_epochs(store)

    def handle(batch_df, epoch_id: int) -> None:
        if int(epoch_id) in committed:
            return  # replayed epoch: segment already durable, skip (E1/E4)
        window = as_partitioned_source(batch_df, num_partitions)
        res = process_window(
            spark,
            store,
            window,
            batch_id=store.next_entry_id(),
            cfg=cfg,
            extra_metrics={"epoch_id": int(epoch_id)},
        )
        committed.add(int(epoch_id))
        if results is not None and res is not None:
            results.append(res)

    q = (
        pages.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
