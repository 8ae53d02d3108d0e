"""Phrase queries (ES `match_phrase`): positional matching + BM25 phrase
scoring, DataFrame-native.

The reference posts the whole JSON `_source` to Elasticsearch 5.5
(/root/reference/src/main/java/org/elasticsearch/kafka/indexer/service/ElasticSearchBatchService.java:60),
so every indexed field is phrase-searchable there — `match_phrase` is the
first query an ES user runs after `match`. This module re-implements it
natively with Lucene's public PhraseQuery semantics (slop 0 = exact
adjacency):

- a document matches when the phrase's terms occur at consecutive
  positions, in order;
- the score is BM25 with tf replaced by the PHRASE frequency (number of
  occurrences of the whole phrase in the doc) and idf replaced by the SUM
  of the member terms' idfs, one contribution per phrase position
  (repeated terms count each time) — Lucene PhraseQuery + BM25Similarity.

Scale shape (the 100 TB lens):
- The positional token stream `posexplode(tokens(text))` is
  broadcast-semi-filtered to the phrase's terms BEFORE any shuffle, so the
  groupBy sees only matching occurrences — never the full corpus positions.
- Adjacency is the classic positional-join normalization: a token at
  position p matching phrase slot i votes for base position p - i; a base
  collecting all n slots is one phrase occurrence. One shuffle on
  (doc_id, base), a second tiny one on doc_id (only matching docs survive).
- df / corpus stats / idf-sum are single-row or per-term aggregates,
  broadcast into the scoring join. Top-k is a TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.analysis import tokens
from engine.config import DEFAULT_CONFIG, SCORE_DECIMALS, TOKEN_PATTERN, IndexConfig
from engine.query import corpus_stats, doc_lengths


def token_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, term) — the positional token stream, pos 0-based."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )


def _phrase_slots(spark: SparkSession, phrase: list[str]) -> DataFrame:
    """(pidx, term): one row per phrase position (repeats kept)."""
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(phrase)], "pidx int, term string"
    )


def phrase_frequencies(
    spark: SparkSession,
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ptf) for docs containing the exact phrase (ptf >= 1).

    ptf = number of occurrences of the whole phrase (overlaps allowed,
    e.g. "a a" occurs twice in "a a a") — Lucene ExactPhraseMatcher
    freq semantics.
    """
    n = len(phrase)
    if n == 0:
        raise ValueError("empty phrase")
    slots = _phrase_slots(spark, phrase)
    # votes: (doc_id, base, pidx) — unique rows because (doc_id, pos) is
    # unique in the positional stream and base = pos - pidx.
    votes = token_positions(docs, id_col, text_col).join(
        F.broadcast(slots), "term"
    ).select(
        "doc_id", (F.col("pos") - F.col("pidx")).alias("base"), "pidx"
    )
    occurrences = (
        votes.groupBy("doc_id", "base")
        .agg(F.count(F.lit(1)).alias("n_slots"))
        .where((F.col("n_slots") == F.lit(n)) & (F.col("base") >= 0))
    )
    return occurrences.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("ptf")
    )


def phrase_scores(
    spark: SparkSession,
    docs: DataFrame,
    phrase: list[str],
    cfg: IndexConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, raw_score) for every doc containing the phrase — the
    UN-truncated, un-rounded phrase BM25 relation. bm25_phrase_topk is
    round + top-k over this; simple_query_string sums it with term
    contributions (one expression tree per formula).

    score(d) = [sum over phrase positions i of idf(term_i)]
               * ptf / (ptf + k1 * (1 - b + b * |d| / avgdl))
    — the engine's BM25 form (same as bm25_topk, constant (k1+1) factor
    dropped: rank-identical) with tf := phrase frequency and idf := summed
    member-term idfs (Lucene PhraseQuery scoring).
    """
    distinct_terms = sorted(set(phrase))
    q = spark.createDataFrame([(t,) for t in distinct_terms], "term string")
    # per-term multiplicity in the phrase: repeated terms contribute their
    # idf once per phrase position.
    mult = spark.createDataFrame(
        [(t, phrase.count(t)) for t in distinct_terms], "term string, mult int"
    )

    dl = doc_lengths(docs, id_col, text_col)
    stats = corpus_stats(dl)

    # df for the phrase's terms only (broadcast-semi-filter before shuffle;
    # identical values to full-corpus df for those terms).
    matched = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
        )
        .join(F.broadcast(q), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_sum = (
        dfreq.join(F.broadcast(mult), "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .agg(
            F.sum(
                F.col("mult")
                * F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
            ).alias("idf_sum")
        )
    )

    ptf = phrase_frequencies(spark, docs, phrase, id_col, text_col)
    denom = F.col("ptf") + F.lit(cfg.k1) * (
        F.lit(1.0 - cfg.b) + F.lit(cfg.b) * F.col("doc_len") / F.col("avgdl")
    )
    return (
        ptf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(idf_sum))
        .select(
            "doc_id",
            (F.col("idf_sum") * F.col("ptf") / denom).alias("raw_score"),
        )
    )


def bm25_phrase_topk(
    spark: SparkSession,
    docs: DataFrame,
    phrase: list[str],
    k: int = 10,
    cfg: IndexConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase BM25 top-k over a raw document table: round + top-k by
    (score desc, doc_id asc) over phrase_scores (the shared scoring
    relation)."""
    return (
        phrase_scores(spark, docs, phrase, cfg, id_col, text_col)
        .select(
            "doc_id", F.round(F.col("raw_score"), SCORE_DECIMALS).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL twins
# ---------------------------------------------------------------------------


def _sql_quote(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def _ptf_cte(
    phrase: list[str], table: str, id_col: str, text_col: str
) -> str:
    """DuckDB CTE body: (doc_id, ptf) — phrase frequency over the 1-based
    token list, computed with a list_filter lambda over candidate start
    positions [1, len(t) - n + 1] (empty when the doc is shorter than the
    phrase)."""
    n = len(phrase)
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')"
    conds = " AND ".join(
        f"t[i+{j}] = {_sql_quote(w)}" if j else f"t[i] = {_sql_quote(w)}"
        for j, w in enumerate(phrase)
    )
    return (
        f"SELECT doc_id, CAST(len(list_filter(range(1, len(t) - {n} + 2),"
        f" i -> {conds})) AS BIGINT) AS ptf\n"
        f"  FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table})"
    )


def phrase_freq_oracle_sql(
    phrase: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return f"""
WITH ptf AS (
  {_ptf_cte(phrase, table, id_col, text_col)}
)
SELECT doc_id, ptf FROM ptf WHERE ptf > 0
"""


def bm25_phrase_oracle_sql(
    phrase: list[str],
    k: int = 10,
    cfg: IndexConfig = DEFAULT_CONFIG,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')"
    distinct_terms = sorted(set(phrase))
    mult_values = ", ".join(
        f"({_sql_quote(t)}, {phrase.count(t)})" for t in distinct_terms
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}
), dl AS (
  SELECT {id_col} AS doc_id, len({toks}) AS doc_len FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), stats AS (
  SELECT count(*) AS n_docs, avg(doc_len) AS avgdl FROM dl
), q(term, mult) AS (
  VALUES {mult_values}
), idfsum AS (
  SELECT sum(q.mult * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS idf_sum
  FROM q JOIN dfreq d USING (term) CROSS JOIN stats s
), ptf AS (
  {_ptf_cte(phrase, table, id_col, text_col)}
)
SELECT p.doc_id,
       round(i.idf_sum * p.ptf
             / (p.ptf + {cfg.k1} * (1 - {cfg.b} + {cfg.b} * dl.doc_len / s.avgdl)),
             {SCORE_DECIMALS}) AS score
FROM ptf p
JOIN dl USING (doc_id)
CROSS JOIN stats s
CROSS JOIN idfsum i
WHERE p.ptf > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# match_phrase_prefix (ES): phrase whose LAST position is a prefix
# ---------------------------------------------------------------------------


def phrase_prefix_freqs(
    spark: SparkSession,
    docs: DataFrame,
    phrase: list[str],
    max_expansions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES `match_phrase_prefix`: the phrase's last word is a PREFIX; the
    query matches docs where the fixed words are followed (adjacently, in
    order) by any term starting with it. Output: (doc_id, pptf) with pptf =
    number of such occurrences, >= 1.

    ES semantics kept: the prefix expands to at most `max_expansions`
    distinct index terms in term-dictionary (lexicographic) order — a doc
    whose completion falls outside the expansion set does NOT match
    (documented ES behavior, the autocomplete use case).

    Scale shape: the expansion set is a distinct-terms aggregate FILTERED
    BY the prefix before the shuffle (startswith pushes to the scan as a
    range predicate on a term dictionary; here a filter on the exploded
    stream), then TakeOrdered(max_expansions) and broadcast. The
    positional vote join is the same one-shuffle base-normalization as
    phrase_frequencies — only tokens matching a slot survive to shuffle.
    """
    n = len(phrase)
    if n < 2:
        raise ValueError("match_phrase_prefix needs >= 1 fixed word + prefix")
    fixed, prefix = phrase[:-1], phrase[-1]
    pos = token_positions(docs, id_col, text_col)

    expansions = (
        pos.select("term")
        .where(F.col("term").startswith(prefix))
        .distinct()
        .orderBy("term")
        .limit(max_expansions)
    )

    slots = _phrase_slots(spark, fixed)
    fixed_votes = pos.join(F.broadcast(slots), "term").select(
        "doc_id", (F.col("pos") - F.col("pidx")).alias("base"), "pidx"
    )
    last_votes = pos.join(F.broadcast(expansions), "term").select(
        "doc_id",
        (F.col("pos") - F.lit(n - 1)).alias("base"),
        F.lit(n - 1).alias("pidx"),
    )
    # no distinct needed: (doc_id, base, pidx) is unique per stream (base =
    # pos - pidx and (doc_id, pos) is unique) and the streams carry
    # disjoint pidx values (fixed < n-1, last = n-1) — union adds no dups.
    votes = fixed_votes.unionByName(last_votes)
    occurrences = (
        votes.groupBy("doc_id", "base")
        .agg(F.count(F.lit(1)).alias("n_slots"))
        .where((F.col("n_slots") == F.lit(n)) & (F.col("base") >= 0))
    )
    return occurrences.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("pptf")
    )


def phrase_prefix_oracle_sql(
    phrase: list[str],
    max_expansions: int = 50,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    n = len(phrase)
    fixed, prefix = phrase[:-1], phrase[-1]
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')"
    conds = " AND ".join(
        [
            (f"t[i+{j}] = {_sql_quote(w)}" if j else f"t[i] = {_sql_quote(w)}")
            for j, w in enumerate(fixed)
        ]
        + [f"list_contains(e.el, t[i+{n - 1}])"]
    )
    like = _sql_quote(prefix.replace("%", "\\%").replace("_", "\\_") + "%")
    return f"""
WITH exp AS (
  SELECT DISTINCT term FROM (
    SELECT unnest({toks}) AS term FROM {table}
  ) WHERE term LIKE {like} ESCAPE '\\'
  ORDER BY term LIMIT {max_expansions}
), e AS (
  SELECT coalesce(list(term ORDER BY term), []) AS el FROM exp
), ptf AS (
  SELECT doc_id, CAST(len(list_filter(range(1, len(t) - {n} + 2),
         i -> {conds})) AS BIGINT) AS pptf
  FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table}) CROSS JOIN e
)
SELECT doc_id, pptf FROM ptf WHERE pptf > 0
"""


# ---------------------------------------------------------------------------
# span_near / sloppy phrase (ES match_phrase slop > 0, span_near in_order)
# ---------------------------------------------------------------------------


def span_near_freqs(
    spark: SparkSession,
    docs: DataFrame,
    terms: list[str],
    slop: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES `span_near` with `in_order: true` (and the matching semantics of
    `match_phrase` with `slop`): the terms occur IN ORDER with total gap
    (span width minus the n terms) at most `slop`. Output: (doc_id, snf)
    where snf = the number of DISTINCT start positions admitting at least
    one valid completion — slop 0 degrades to exact phrase starts (tested
    against phrase_frequencies).

    The frozen counting contract (documented, shared with the oracle): a
    start position counts once however many completions it has — the
    deterministic, engine-agnostic subset of Lucene's SloppyPhraseMatcher
    behavior (whose freq weighting 1/(1+matchLength) is scoring-internal).

    Scale shape: the positional stream is broadcast-semi-filtered to the
    query terms BEFORE any shuffle (same as phrase_frequencies); the
    in-order chain is an (n-1)-step self-join on doc_id with BOUNDED
    range predicates (p_{i+1} > p_i, p_n - p_1 <= n-1+slop), so each join
    only pairs occurrences within a slop-bounded window — never a full
    positional cross product. n is the query length (tiny); the joined
    relation is per-doc occurrences of the queried terms only."""
    n = len(terms)
    if n < 2:
        raise ValueError("span_near needs >= 2 terms")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    pos = token_positions(docs, id_col, text_col)
    width = n - 1 + slop

    legs = []
    for i, t in enumerate(terms):
        legs.append(
            pos.where(F.col("term") == t)
            .select("doc_id", F.col("pos").alias(f"p{i}"))
        )
    joined = legs[0]
    for i in range(1, n):
        cond = (F.col(f"p{i}") > F.col(f"p{i - 1}")) & (
            F.col(f"p{i}") - F.col("p0") <= width
        )
        joined = joined.join(legs[i], "doc_id").where(cond)
    return (
        joined.select("doc_id", "p0")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("snf"))
    )


def span_near_oracle_sql(
    terms: list[str],
    slop: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    n = len(terms)
    width = n - 1 + slop
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')"
    joins = []
    for i in range(1, n):
        joins.append(
            f"JOIN p t{i} ON t{i}.doc_id = t0.doc_id"
            f" AND t{i}.term = {_sql_quote(terms[i])}"
            f" AND t{i}.pos > t{i - 1}.pos"
            f" AND t{i}.pos - t0.pos <= {width}"
        )
    return f"""
WITH p AS (
  SELECT doc_id, CAST(generate_subscripts(t, 1) AS BIGINT) AS pos,
         unnest(t) AS term
  FROM (SELECT {id_col} AS doc_id, {toks} AS t FROM {table})
), starts AS (
  SELECT DISTINCT t0.doc_id, t0.pos
  FROM p t0
  {' '.join(joins)}
  WHERE t0.term = {_sql_quote(terms[0])}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS snf
FROM starts GROUP BY doc_id
"""
