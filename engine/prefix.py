"""Prefix term queries (ES `prefix`): constant-score multi-term expansion.

Elasticsearch 5.5 (the engine the reference delegates every query to,
/root/reference/build.gradle:42) rewrites a `prefix` query with Lucene's
CONSTANT_SCORE rewrite: every document containing ANY term with the prefix
matches with score = boost (1.0), no tf/idf. Ties break by doc id — the
same deterministic (score desc, doc_id asc) ordering the rest of the
engine uses.

Scale shape (the 100 TB lens):
- Corpus path: the `startswith` filter lands on the exploded token stream
  BEFORE the distinct's shuffle, so only matching occurrences move.
- Store path: `StringStartsWith(term, ...)` is pushed to the posting-block
  parquet scan (term-sorted files -> row-group skipping); only matching
  terms' blocks are ever decoded, doc-ids-only (tf/dl streams stay
  undecoded). Distinct-per-doc is one shuffle over matching postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.analysis import tokens
from engine.config import TOKEN_PATTERN


def prefix_match(
    spark: SparkSession,
    docs: DataFrame,
    prefix: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Constant-score prefix query over a raw document table.

    Returns (doc_id, score=1.0), first k matching docs by doc_id asc
    (constant score makes doc id the ES tie-break)."""
    matched = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .where(F.col("term").startswith(prefix))
        .select("doc_id")
        .distinct()
    )
    return (
        matched.select("doc_id", F.lit(1.0).alias("score"))
        .orderBy(F.col("doc_id").asc())
        .limit(k)
    )


def search_store_prefix(
    spark: SparkSession,
    store,
    prefix: str,
    k: int | None = 10,
) -> DataFrame:
    """Constant-score prefix query over a persisted store: matching terms'
    posting blocks are found via the pushed StringStartsWith scan filter and
    decoded doc-ids-only; superseded docs are excluded via the live-docs
    join (search_store semantics)."""
    from engine.merge import live_docs_for_store
    from engine.postings import decode_postings_doc_ids

    blocks = store.postings(spark).where(F.col("term").startswith(prefix))
    matched = decode_postings_doc_ids(blocks, codec=store.codec)
    live = live_docs_for_store(spark, store)
    if live is not None:
        matched = matched.join(live.select("doc_id"), "doc_id")
    scored = matched.select("doc_id", F.lit(1.0).alias("score"))
    if k is None:
        # all matches, unordered — for callers that re-rank after a doc-id
        # remap (avoids a pointless global top-k before the remap)
        return scored
    return scored.orderBy(F.col("doc_id").asc()).limit(k)


def prefix_oracle_sql(
    prefix: str,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    esc = prefix.replace("'", "''").replace("%", "\\%").replace("_", "\\_")
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')) AS term
  FROM {table}
)
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM toks WHERE term LIKE '{esc}%' ESCAPE '\\'
ORDER BY doc_id ASC
LIMIT {k}
"""
