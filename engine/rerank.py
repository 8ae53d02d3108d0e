"""Second-phase result shaping: ES `collapse` (field collapsing) and
`rescore` (top-window two-phase ranking).

The reference posts whole `_source` docs into ES 5.5
(service/ElasticSearchBatchService.java:60) and its users consume the full
search API; these two endpoints are the result-diversification remainder:

  - collapse  -> collapse_topk   (one best hit per value of a field —
                 the ES idiom for "top pages but at most one per site";
                 on the webtext corpus: one best doc per `source`)
  - rescore   -> rescore_topk    (first-pass BM25 ranks the corpus; a
                 more expensive second query re-scores ONLY the top
                 `window_size` hits; total = query_weight * first +
                 rescore_weight * second — ES query_rescorer semantics)

100 TB shape:
- collapse is the WindowGroupLimit plan this repo insists on for per-group
  top-k (SURVEY 7.2e): `row_number() <= 1` over (collapse_col) rewrites to
  a map-side partial + final WindowGroupLimit pair, so a hot group (one
  domain owning half the corpus) ships at most 1 row per partition into
  the shuffle — never the group's full posting list.
- rescore is the bounded-second-pass idiom: the expensive scorer runs on
  `window_size` rows (a driver-bounded constant), NOT the corpus. The
  first pass stays TakeOrderedAndProject (per-partition heaps); the
  second-pass join keys on a window_size-row relation, which Spark
  broadcasts. This is exactly why ES offers rescore: phrase/proximity
  scoring over 10^12 docs is unpayable, over the top-200 it is free.

Both return rounded scores with the deterministic (score desc, doc_id asc)
contract shared by every ranked query in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.config import DEFAULT_CONFIG, SCORE_DECIMALS, TOKEN_PATTERN, IndexConfig
from engine.query import bm25_contribs


# ---------------------------------------------------------------------------
# collapse: one best hit per field value (ES field collapsing)
# ---------------------------------------------------------------------------


def collapse_topk(
    spark: SparkSession,
    docs: DataFrame,
    query_terms: list[str],
    collapse_col: str,
    k: int = 10,
    cfg: IndexConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES `collapse`: BM25 top-k where at most ONE hit (the best-scoring,
    doc_id-asc tie-break) survives per distinct `collapse_col` value.

    Plan: per-doc scores (single shuffle, same bm25_contribs relation as
    every other ranked query) -> join the collapse field -> row_number()
    over (collapse_col) filtered to 1 — Spark rewrites that filter into a
    WindowGroupLimit pair, so each partition forwards at most one row per
    group — -> global top-k via TakeOrderedAndProject.

    Returns (collapse_col, doc_id, score), ordered (score desc, doc_id asc).
    """
    contribs = bm25_contribs(
        spark, docs, query_terms, cfg=cfg, id_col=id_col, text_col=text_col
    )
    per_doc = contribs.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score")
    )
    with_field = per_doc.join(
        docs.select(F.col(id_col).alias("doc_id"), collapse_col), "doc_id"
    )
    best_in_group = F.row_number().over(
        Window.partitionBy(collapse_col).orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
    )
    return (
        with_field.withColumn("_rk", best_in_group)
        .where(F.col("_rk") == 1)
        .select(collapse_col, "doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def collapse_oracle_sql(
    query_terms: list[str],
    collapse_col: str,
    k: int = 10,
    cfg: IndexConfig = DEFAULT_CONFIG,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    terms_values = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')) AS term
  FROM {table}
), dl AS (
  SELECT {id_col} AS doc_id,
         len(regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')) AS doc_len
  FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), stats AS (
  SELECT count(*) AS n_docs, avg(doc_len) AS avgdl FROM dl
), q(term) AS (
  VALUES {terms_values}
), scored AS (
  SELECT tf.doc_id,
         round(sum( ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.doc_len / stats.avgdl))) ), {SCORE_DECIMALS}) AS score
  FROM tf
  JOIN q USING (term)
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
), collapsed AS (
  SELECT d.{collapse_col}, s.doc_id, s.score,
         row_number() OVER (PARTITION BY d.{collapse_col}
                            ORDER BY s.score DESC, s.doc_id ASC) AS rk
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
)
SELECT {collapse_col}, doc_id, score
FROM collapsed WHERE rk = 1
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# rescore: two-phase ranking over a bounded top window (ES query_rescorer)
# ---------------------------------------------------------------------------


def rescore_topk(
    spark: SparkSession,
    docs: DataFrame,
    query_terms: list[str],
    rescore_terms: list[str],
    window_size: int = 50,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    cfg: IndexConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES `rescore` (query_rescorer): rank by the first query, keep the top
    `window_size` hits, compute the rescore query's BM25 on JUST those hits,
    final score = query_weight * first + rescore_weight * second (ES
    score_mode=total default; a window doc not matching the rescore query
    keeps its first-pass contribution, second = 0).

    Window membership is decided on the ROUNDED first-pass score with the
    doc_id tie-break — the same deterministic contract as bm25_topk, so the
    oracle selects the identical window.

    Returns (doc_id, first_score, score), ordered (score desc, doc_id asc).
    """
    # localCheckpoint the window_size-row first-pass result: it is consumed
    # TWICE (the broadcast window-id filter and the final left join), and
    # without materialization the whole first-pass corpus aggregation +
    # top-N subtree would execute twice in one job
    first = (
        bm25_contribs(
            spark, docs, query_terms, cfg=cfg, id_col=id_col, text_col=text_col
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), SCORE_DECIMALS).alias("first_score"))
        .orderBy(F.col("first_score").desc(), F.col("doc_id").asc())
        .limit(window_size)
        .localCheckpoint()
    )
    # the window doc-id set is a window_size-row broadcast: the rescore
    # contribs are filtered to it BEFORE their groupBy, so the second
    # pass's shuffle carries at most window_size docs' rows, not the corpus
    second = (
        bm25_contribs(
            spark, docs, rescore_terms, cfg=cfg, id_col=id_col, text_col=text_col
        )
        .join(F.broadcast(first.select("doc_id")), "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), SCORE_DECIMALS).alias("second_score"))
    )
    combined = F.round(
        F.lit(query_weight) * F.col("first_score")
        + F.lit(rescore_weight) * F.coalesce(F.col("second_score"), F.lit(0.0)),
        SCORE_DECIMALS,
    )
    return (
        first.join(second, "doc_id", "left")
        .select("doc_id", "first_score", combined.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def rescore_oracle_sql(
    query_terms: list[str],
    rescore_terms: list[str],
    window_size: int = 50,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    cfg: IndexConfig = DEFAULT_CONFIG,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    q1_values = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    q2_values = ", ".join(f"('{t}')" for t in sorted(set(rescore_terms)))
    bm25 = (
        "round(sum( ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))"
        f" * (tf.tf / (tf.tf + {cfg.k1} * (1 - {cfg.b} + {cfg.b}"
        f" * dl.doc_len / stats.avgdl))) ), {SCORE_DECIMALS})"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')) AS term
  FROM {table}
), dl AS (
  SELECT {id_col} AS doc_id,
         len(regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')) AS doc_len
  FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), stats AS (
  SELECT count(*) AS n_docs, avg(doc_len) AS avgdl FROM dl
), q1(term) AS (
  VALUES {q1_values}
), q2(term) AS (
  VALUES {q2_values}
), first AS (
  SELECT tf.doc_id, {bm25} AS first_score
  FROM tf JOIN q1 USING (term) JOIN dfreq USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
), win AS (
  SELECT doc_id, first_score FROM first
  ORDER BY first_score DESC, doc_id ASC
  LIMIT {window_size}
), second AS (
  SELECT tf.doc_id, {bm25} AS second_score
  FROM tf JOIN q2 USING (term) JOIN dfreq USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT w.doc_id, w.first_score,
       round({query_weight} * w.first_score
             + {rescore_weight} * coalesce(s.second_score, 0.0), {SCORE_DECIMALS}) AS score
FROM win w LEFT JOIN second s USING (doc_id)
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
