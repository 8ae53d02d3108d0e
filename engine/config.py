"""Engine configuration.

BM25 constants are pinned to the reference stack's defaults: the reference
delegates ranking to Elasticsearch 5.5.0 (/root/reference/build.gradle:42),
whose default similarity is BM25 with k1=1.2, b=0.75 and whose default
analyzer is `standard` (Unicode word segmentation + lowercase, no stopwords).

The ingest knobs mirror the reference's config surface
(/root/reference/src/main/resources/config/kafka-es-indexer.properties):
batch size bound (max.partition.fetch.bytes ~ rows_per_batch here) and
worker pool count (kafka.consumer.pool.count ~ Spark parallelism).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Tokenizer: ES 5.5 `standard` analyzer ~= Unicode word segmentation +
# lowercase. We pin a deterministic regex over Unicode letter/number runs
# that both Java regex (Spark) and RE2 (DuckDB oracle) interpret identically.
TOKEN_PATTERN = r"[\p{L}\p{N}]+"

# Score rounding for cross-engine comparison: Spark and the DuckDB/pandas
# oracle sum float contributions in different orders (~1e-15 relative
# difference); both sides round to this many decimals before ranking so
# top-k membership and tie-breaks (by doc_id asc) are deterministic.
SCORE_DECIMALS = 4


@dataclass(frozen=True)
class IndexConfig:
    """All engine knobs in one immutable bag."""

    # BM25 (ES 5.5 defaults)
    k1: float = 1.2
    b: float = 0.75

    # Posting-list block encoding (Lucene-style block postings)
    block_size: int = 128
    # posting-block value codec: "varint" (LEB128, default) or "pfor"
    # (per-block FOR bit-packing, engine/codecs.py). A store records its
    # codec in _meta.json at create(); all its segments share it.
    codec: str = "varint"

    # Opt-in positional postings sidecar (engine/positions.py): each segment
    # additionally stores per-(term, doc) token positions (delta+varint), so
    # the store can answer ES match_phrase queries without raw text. Off by
    # default — positions roughly double index size and build cost (the
    # Lucene positions-vs-docs-only mapping tradeoff).
    store_positions: bool = False

    # Opt-in stored `_source` (ES keeps it by default): the per-segment doc
    # table additionally carries the extracted text, which is what the ES
    # `_reindex` API reads — a store built with store_source=True can be
    # reindexed into a new store (new codec/routing/analyzer) without the
    # original corpus (engine/reindex.py). Off by default here because the
    # doc table is otherwise metadata-sized.
    store_source: bool = False

    # Micro-ingest batch sizing (reference: 1 MiB/partition poll bound,
    # jobs/ConsumerManager.java:52-55). We bound by rows.
    rows_per_batch: int = 100_000

    # Storage layout
    index_root: str = "/tmp/engine_indexes"

    # Tokenizer
    token_pattern: str = TOKEN_PATTERN

    # Top-k defaults
    default_k: int = 10

    # Doc-id assignment strategy (engine.docids): "range" (default) =
    # repartitionByRange + driver prefix sums — fully parallel, the
    # 1000-executor path; "window" = global row_number (a single serial
    # numbering task) kept as the equivalence-test oracle.
    docid_strategy: str = "range"

    # WAND keeps the superseded-doc set driver-side (tiny between merges by
    # construction). Above this size the engine falls back to the fully
    # distributed exact path instead of shipping a huge set to every task.
    max_deleted_driver: int = 1_000_000

    # Routing-aware placement (D9, reference ElasticSearchBatchService
    # routing value + filtered-alias routing): name of a window column whose
    # value routes each doc. When set, segments store docs AND postings
    # hive-partitioned by this column, so routed queries prune to one
    # routing partition's files (the ES shard-routing data-locality story).
    routing_col: str | None = None

    # Shuffle parallelism hint for index-build jobs (None = session default)
    shuffle_partitions: int | None = None

    # Data-dependent partition sizing. A fixed repartitionByRange(N) with
    # N = defaultParallelism gives a 1,000-doc micro-batch the same 32-way
    # fan-out (and 32 x routing-values output files) as a 10M-doc bulk load
    # — per-task scheduling and tiny-file overhead then dominate the batch
    # (the 8->32 strong-scaling residual, VERDICT r02 item 3). The build
    # fan-out is therefore sized from measured data:
    #   n = min(ceil(data / task_floor), max(cores, ceil(data / part_cap)))
    # i.e. a tiny batch collapses to a few tasks (>= task_floor rows each),
    # a medium batch uses every core, and a bulk load grows past the core
    # count so no partition exceeds the per-task cap. Ingest sizes by batch
    # rows; merge sizes by the merged token count (known from stats).
    rows_per_id_partition: int = 25_000     # cap: docs per ingest partition
    id_task_floor_rows: int = 1_000         # floor: docs that justify a task
    postings_per_merge_partition: int = 2_000_000  # cap: postings per merge task
    merge_task_floor_postings: int = 100_000       # floor for a merge task
    # WAND doc-id range count is derived from doc_id_hwm with the same
    # formula (was a fixed 32): a 5k-doc store scans in a few tasks instead
    # of 32 near-empty Python groups; a 10^12-doc store fans out so every
    # range spans at most docs_per_wand_range ids.
    docs_per_wand_range: int = 50_000       # cap: doc-id span per WAND task
    wand_range_floor_docs: int = 2_000      # floor: doc span worth a task
    # Cost-based plan choice (strategy="auto" in search_store_wand /
    # IndexReader.search_wand): run the block-max scan only where it is
    # measured to win — few-term queries over LONG posting lists. Per-query
    # calibration (soak.jsonl per_query latencies x wand_skip.jsonl
    # candidate blocks, BENCH/NOTES.md round-5 skip-ratio section):
    #   - ~0.9M candidate postings/term (the 1M-doc store): exact wins most
    #     runs; ~1.9M/term (2M store): WAND wins 1-2-term queries (token
    #     k=1: 748 vs 1,129 ms) -> threshold between the two measurements.
    #   - 3-4-term disjunctions: WAND loses at EVERY size (sum-of-per-term
    #     bounds vs θ keeps windows alive, skip ~0; the 4-term query at 2M:
    #     22.8s WAND vs 2.5s exact) -> never auto-WAND above 2 terms.
    # Both paths are rank-identical (tested); these knobs only pick the
    # cheaper plan.
    wand_auto_min_postings_per_term: int = 1_500_000
    wand_auto_max_terms: int = 2

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = IndexConfig()


def plan_fanout(n_units: int, floor: int, cap: int, cores: int) -> int:
    """Partition count for `n_units` of work (docs, postings, ...):
    min(ceil(n/floor), max(cores, ceil(n/cap))) clamped to >= 1.

    - tiny input  -> ceil(n/floor) tasks (each worth scheduling),
    - medium      -> every core busy,
    - bulk        -> grows past the core count so no partition holds more
                     than `cap` units (memory / file-size bound)."""
    return max(1, min(-(-n_units // floor), max(cores, -(-n_units // cap))))
