"""ES percolator: reverse search — store QUERIES, stream documents, return
which stored queries each document matches.

The reference's deployment is an ingestion firehose into ES
(consumer/ConsumerManager.java run loop); the percolator is the ES-side
feature its users pair with that firehose for alerting/routing: "tell me
when a document matching MY query arrives". ES 5.5 percolation runs each
doc through the stored-query index; this engine implements the
conjunctive-term-query subset (a stored query = a set of required terms +
minimum_should_match, the ES `percolate` bool/term shape) as ONE
relational pass.

100 TB shape — the whole point of doing this in Spark:
- the stored-query table (thousands of alert rules) explodes to
  (query_id, term) and BROADCASTS; the document token stream joins it
  map-side, so matching N queries against a day of crawl is one corpus
  scan + one groupBy — scan count independent of query count, the same
  economics as _msearch (SURVEY 7.2e "batch the queries").
- per-(doc, query) the join emits only MATCHING (doc, query, term) rows:
  sparse in practice because each query holds a few terms.
- the match test (distinct matched terms >= min_match) is a count-distinct
  aggregate with map-side partial aggregation, one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.analysis import tokens
from engine.config import TOKEN_PATTERN


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, list[str], int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Match every document against every stored query.

    `queries`: (query_id, required_terms, min_match) rows — a doc matches
    when it contains at least `min_match` DISTINCT terms of the query
    (min_match == len(terms) is the conjunctive ES `percolate` term query;
    lower values are ES minimum_should_match semantics).

    Returns (doc_id, query_id, n_matched) for matching combinations only,
    one row per match."""
    qrows = [
        (int(qid), sorted(set(t.lower() for t in terms)), int(mm))
        for qid, terms, mm in queries
    ]
    if not any(terms for _, terms, _ in qrows):
        raise ValueError(
            "percolate requires at least one stored query with terms"
        )
    qdf = spark.createDataFrame(
        qrows, "query_id long, terms array<string>, min_match long"
    )
    qterms = qdf.select(
        "query_id", "min_match", F.explode("terms").alias("term")
    )
    doc_terms = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
        )
        .distinct()
    )
    return (
        doc_terms.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "query_id", "min_match")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .where(F.col("n_matched") >= F.col("min_match"))
        .select("doc_id", "query_id", "n_matched")
    )


def percolate_oracle_sql(
    queries: list[tuple[int, list[str], int]],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    qvals = ", ".join(
        f"({int(qid)}, '{t.lower()}', {int(mm)})"
        for qid, terms, mm in queries
        for t in sorted(set(x.lower() for x in terms))
    )
    if not qvals:
        raise ValueError(
            "percolate requires at least one stored query with terms"
        )
    return f"""
WITH toks AS (
  SELECT DISTINCT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')) AS term
  FROM {table}
), q(query_id, term, min_match) AS (
  VALUES {qvals}
)
SELECT doc_id, query_id, count(*) AS n_matched
FROM toks JOIN q USING (term)
GROUP BY doc_id, query_id, min_match
HAVING count(*) >= min_match
"""
