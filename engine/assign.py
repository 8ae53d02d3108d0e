"""Per-record assignment hook (T2): index / id / routing, pluggable.

The reference's whole plugin surface is IMessageHandler
(/root/reference/src/main/java/org/elasticsearch/kafka/indexer/service/
IMessageHandler.java:16-26): transform the message AND assign each event its
(indexName, indexType, eventId, routing) before the bulk add
(ElasticSearchBatchService.java:57-66 — addEventToBulkRequest takes all four
per event; ElasticSearchClientService.java:135-146 applies the routing to
the request). The shipped impl uses static config values
(SimpleMessageHandlerImpl / BasicMessageHandler).

Spark-first shape: an assigner is DECLARATIVE — Column expressions, not a
per-record callback — so assignment stays inside whole-stage codegen and
Catalyst can prune/push it. A custom assigner provides any expressions it
likes (including pandas-UDF-backed ones if truly needed); the default mirrors
the reference's static config (one index, no routing).

The transform half of IMessageHandler lives in engine.analysis.extract_text;
this module is the placement half:
  - index_name  -> which index a record lands in (D11 multi-index fan-out:
                   one bulk/batch may span several indexes,
                   ElasticSearchBatchService.java:34 keeps a per-index
                   request map)
  - routing     -> which partition WITHIN the index (D9 routing-aware
                   placement; segments are hive-partitioned by this value,
                   queries with routing prune to those files)
  - doc id      -> engine.docids (dense deterministic ids per index)

`indexType` (the 4th slot of addEventToBulkRequest,
ElasticSearchBatchService.java:57) has NO analog here by design: mapping
types were deprecated in ES 6 and removed in ES 8 — one index holds one
document shape. A user who relied on types maps each type to its own
index_name expression (the fan-out path above), which is exactly the
migration ES itself prescribed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INDEX_COL = "index_name"
ROUTING_COL = "routing"


@dataclass(frozen=True)
class RecordAssigner:
    """Declarative (index_name, routing) assignment.

    `index_name` / `routing`: functions DataFrame -> Column evaluated over
    the record window (so they can reference any record field, like the
    reference's IMessageHandler sees the whole message). None routing =
    single-partition semantics (the reference's default: routing unset).
    """

    index_name: Callable[[DataFrame], Column] = lambda df: F.lit("default")
    routing: Callable[[DataFrame], Column] | None = None

    def assign(self, df: DataFrame) -> DataFrame:
        out = df.withColumn(INDEX_COL, self.index_name(df).cast("string"))
        if self.routing is not None:
            out = out.withColumn(ROUTING_COL, self.routing(df).cast("string"))
        return out


def static_assigner(
    index_name: str,
    routing_col: str | None = None,
    num_shards: int | None = None,
) -> RecordAssigner:
    """The reference's shipped behavior: a configured index name
    (kafka-es-indexer.properties elasticsearch.index.name) and, optionally,
    routing by an existing column's value (ES field-value routing).

    `num_shards` bounds routing cardinality exactly like ES does
    (shard = hash(routing) % number_of_shards): pass it when the routing
    key is high-cardinality (user id, url) so the segment layout stays at
    num_shards hive partitions instead of one directory per distinct key.
    Query-side, compute the partition with the same formula
    (pmod(xxhash64(value), num_shards))."""
    if routing_col and num_shards:
        return RecordAssigner(
            index_name=lambda df: F.lit(index_name),
            routing=lambda df: F.pmod(
                F.xxhash64(F.col(routing_col)), F.lit(num_shards)
            ).cast("string"),
        )
    return RecordAssigner(
        index_name=lambda df: F.lit(index_name),
        routing=(lambda df: F.col(routing_col)) if routing_col else None,
    )


def routing_for(spark, value, num_shards: int, dtype: str | None = None) -> str:
    """Query-side half of `static_assigner(num_shards=...)`: the routing
    partition a raw key was placed in — pmod(xxhash64(value), num_shards),
    evaluated by the SAME JVM expression the write path used (no Python
    reimplementation to drift). Mirrors the ES client hashing the routing
    value for you (ElasticSearchClientService.java:140-146): users query by
    raw key, never by shard number.

    `dtype`: cast the literal to the indexed column's Spark type when it
    was non-string (xxhash64 is type-sensitive; a long column's values must
    be hashed as longs). One driver-local 1-row job, milliseconds.
    """
    lit = F.lit(value)
    if dtype is not None:
        lit = lit.cast(dtype)
    expr = F.pmod(F.xxhash64(lit), F.lit(num_shards)).cast("string")
    return spark.range(1).select(expr.alias("r")).first()["r"]
