"""Log-structured segment merge (SURVEY.md §2.5 D5).

Re-implements Lucene's background merge semantics (the reference's output
system; anchor /root/reference/build.gradle:42 + index lifecycle S7-S11):
k segments -> one segment with
  - per-term posting lists k-way merged (doc-id bases are disjoint and
    increasing, so a term's per-segment lists concatenate in segment order;
    the relational groupBy(term) + re-encode restores full 128-blocks),
  - superseded docs expunged (last-write-wins by (url, warc_ts, doc_id) —
    Lucene's "expunge deletes"; reference upsert D10),
  - corpus stats recomputed over surviving docs only.

The merge commits one ledger entry (adds merged, removes inputs) — readers
flip atomically; input segment files can be garbage-collected afterwards.
Merge policy: log-structured — merge when >= `merge_factor` live segments.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from engine.config import DEFAULT_CONFIG, IndexConfig
from engine.postings import build_posting_blocks, decode_postings
from engine.segments import IndexStore, LedgerEntry


def live_doc_ids(docs_df):
    """Latest doc per url: rank by (warc_ts desc, doc_id desc) — newest
    segment wins ties, matching ES upsert-by-id last-write-wins (D10)."""
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.col("doc_id").desc()
    )
    return (
        docs_df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def merge_segments(
    spark: SparkSession,
    store: IndexStore,
    segment_ids: list[str] | None = None,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> str:
    """Merge `segment_ids` (default: all live) into one segment. Returns the
    new segment id. Crash-safe: the ledger entry is committed last; a failed
    merge leaves inputs live and the orphan output is overwritten on retry."""
    inputs = store.live_segments() if segment_ids is None else list(segment_ids)
    if len(inputs) < 2:
        raise ValueError("need at least 2 segments to merge")

    entry_id = store.next_entry_id()
    out_id = f"merge-{entry_id:08d}"

    docs = store.docs(spark, inputs)
    routed = "routing" in docs.columns
    live = live_doc_ids(docs).cache()
    try:
        postings_long = decode_postings(store.postings(spark, inputs))
        # expunge superseded docs' postings (dl already travels in the
        # blocks); routed merges re-attach each doc's routing so the merged
        # blocks stay routing-pure (partitionBy survives the merge)
        if routed:
            merged_tf_dl = postings_long.join(
                live.select("doc_id", "routing"), "doc_id"
            )
        else:
            merged_tf_dl = postings_long.join(
                live.select("doc_id"), "doc_id", "left_semi"
            )

        hwm = store.next_doc_id_base()
        blocks = build_posting_blocks(merged_tf_dl, max(hwm, 1), cfg)

        n_docs = live.count()
        sum_dl = live.agg(F.sum("doc_len")).collect()[0][0] or 0
        stats = {
            "segment_id": out_id,
            "base_doc_id": 0,
            "doc_id_hwm": hwm,
            "n_docs": int(n_docs),
            "sum_dl": int(sum_dl),
            "merged_from": inputs,
        }
        if routed:
            rs = (
                live.groupBy("routing")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s"))
                .collect()
            )
            stats["routing_stats"] = {
                r["routing"]: {"n_docs": int(r["n"]), "sum_dl": int(r["s"] or 0)}
                for r in rs
            }
        # merged segment gets the globally range-partitioned layout — it is
        # the long-lived segment queries hit; micro-ingest segments skip it
        store.write_segment(out_id, blocks, live, stats, ranged=True)
        store.commit(
            LedgerEntry(
                entry_id=entry_id,
                kind="merge",
                segments_added=[out_id],
                segments_removed=inputs,
                metrics={"n_inputs": len(inputs), "n_docs": int(n_docs)},
            )
        )
        return out_id
    finally:
        live.unpersist()


def select_merge_tier(store: IndexStore, merge_factor: int = 8) -> list[str] | None:
    """Size-tiered merge selection (Lucene TieredMergePolicy shape): bucket
    live segments into power-of-two doc-count tiers and pick the smallest
    tier holding >= merge_factor segments. Bounds every merge to at most
    merge_factor similar-sized inputs — at 100 TB a merge job's input is
    O(merge_factor * tier_size), never "all live segments at once"."""
    live = store.live_segments()
    if len(live) < merge_factor:
        return None
    tiers: dict[int, list[str]] = {}
    for s in live:
        n = max(1, int(store.segment_stats(s)["n_docs"]))
        tiers.setdefault(n.bit_length(), []).append(s)
    for t in sorted(tiers):
        if len(tiers[t]) >= merge_factor:
            return sorted(tiers[t])[:merge_factor]
    return None


def maybe_merge(
    spark: SparkSession,
    store: IndexStore,
    merge_factor: int = 8,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> str | None:
    """Tiered log-structured policy: merge the smallest over-full size tier
    (bounded input count), not every live segment."""
    sel = select_merge_tier(store, merge_factor)
    if sel is not None:
        return merge_segments(spark, store, sel, cfg)
    return None
