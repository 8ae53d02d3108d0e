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

    # Hot-term skew defusal: number of salt buckets for the two-stage
    # groupBy(term) when building posting lists (SURVEY.md §4.2).
    salt_buckets: int = 8

    # Terms with df above this fraction of n_docs get salted; the rest go
    # through the single-stage path (salting everything wastes a shuffle).
    hot_term_df_ratio: float = 0.05

    # Micro-ingest batch sizing (reference: 1 MiB/partition poll bound,
    # jobs/ConsumerManager.java:52-55). We bound by rows.
    rows_per_batch: int = 100_000

    # Storage layout
    index_root: str = "/tmp/engine_indexes"

    # Tokenizer
    token_pattern: str = TOKEN_PATTERN

    # Top-k defaults
    default_k: int = 10

    # Doc-id assignment strategy (engine.docids): "window" = global
    # row_number (one serial numbering task, fine per bounded micro-batch);
    # "range" = repartitionByRange + driver prefix sums (fully parallel,
    # provably identical ids — the 1000-executor path).
    docid_strategy: str = "window"

    # Shuffle parallelism hint for index-build jobs (None = session default)
    shuffle_partitions: int | None = None

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = IndexConfig()
