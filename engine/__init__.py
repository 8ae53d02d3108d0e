"""PySpark-native inverted-index build + BM25 query engine.

A from-scratch re-implementation, on Spark DataFrames, of the capabilities of
the reference ingest pipeline songfj/kafka-elasticsearch-consumer (a Kafka ->
Elasticsearch 5.5 bulk indexer, see /root/reference) *plus* the analytics that
pipeline delegated to Elasticsearch: text analysis, inverted-index
construction (posting lists, delta+varint compression, block-max metadata),
immutable segments with log-structured merge, BM25 (k1=1.2, b=0.75) top-k
retrieval with block-max WAND, routing-aware placement, checkpoint-resumable
micro-ingest with at-least-once commit semantics.

Everything here is idiomatic PySpark: DataFrame/SQL plans optimized by
Catalyst, vectorized pandas/Arrow UDFs for the non-relational kernels
(varint block encode/decode, WAND), no per-row Python, no RDDs.
"""

__version__ = "0.1.0"
