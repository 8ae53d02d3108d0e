"""ES search-API surface beyond ranked match queries: sorted search with
`search_after` pagination, `_mget` point lookups, `_count`, and highlight
fragments.

The reference's users consume its output through the full ES search API
(the indexer posts raw `_source` docs, ElasticSearchBatchService.java:60);
these four endpoints are the non-aggregation remainder of that surface:

  - sort + search_after  -> sort_search_after   (cursor-paginated field
                            sort — the ES deep-pagination idiom that
                            replaces from/size at scale)
  - GET /_mget           -> mget_store          (multi-id point lookup on
                            the persisted doc table, pushed IN filter)
  - GET /_count          -> count_query_store   (hit count for a match
                            query served from posting metadata, ids-only
                            decode, never the tf/dl streams)
  - highlight            -> highlight_snippets  (char-offset fragment with
                            <em> marks around the first query-term
                            occurrence, ES plain-highlighter shape)

100 TB shape: sort_search_after is TakeOrderedAndProject over a pushed
range filter (the cursor predicate reaches the parquet scan, so pages deep
into the sort never rescan what earlier pages consumed); mget is a pushed
In(url, ...) lookup; count decodes doc-id streams only for the query's
terms (pushed IN on term -> row-group skipping) and counts distinct ids
without collecting them; highlight is pure JVM string expressions over an
already-bounded top-k page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.config import TOKEN_PATTERN

_DUCK_TOKS = "regexp_extract_all(lower(coalesce({col}, '')), '{pat}')"


# ---------------------------------------------------------------------------
# sort + search_after (ES sorted search, cursor pagination)
# ---------------------------------------------------------------------------


def sort_search_after(
    df: DataFrame,
    sort_col: str,
    after: tuple | None = None,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES sorted search with `search_after`: order by (`sort_col` DESC,
    `id_col` ASC — the unique tie-breaker ES requires), return the `k` rows
    strictly after the cursor `(after_sort, after_id)`.

    The cursor is a plain predicate — `sort < s OR (sort = s AND id > i)` —
    so Catalyst pushes it into the scan: page N+1 never reads the rows page
    N returned, unlike from/size offset pagination which rescans and
    re-sorts everything above the offset (why ES deprecates deep from/size
    and this engine implements search_after instead). The top-k itself is
    TakeOrderedAndProject: per-partition heaps of size k, no global sort.
    """
    out = df
    if after is not None:
        s, i = after
        out = out.where(
            (F.col(sort_col) < F.lit(s))
            | ((F.col(sort_col) == F.lit(s)) & (F.col(id_col) > F.lit(i)))
        )
    return (
        out.orderBy(F.col(sort_col).desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, sort_col)
    )


def sort_search_after_oracle_sql(
    sort_col: str,
    after: tuple | None = None,
    k: int = 10,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    where = ""
    if after is not None:
        s, i = after
        where = (
            f"WHERE {sort_col} < {s} OR ({sort_col} = {s} AND {id_col} > {i})"
        )
    return f"""
        SELECT {id_col}, {sort_col} FROM {table}
        {where}
        ORDER BY {sort_col} DESC, {id_col} ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# _mget: multi-id point lookup on the persisted index's doc table
# ---------------------------------------------------------------------------


def mget_store(spark: SparkSession, store, urls: list[str]) -> DataFrame:
    """ES `_mget`: fetch documents by external id (url) from the persisted
    doc table. The IN filter pushes to the parquet scan (PushedFilters
    In(url, ...) -> row-group skipping via url min/max), so the lookup cost
    is O(matching row groups), not O(corpus). Returns the newest live
    version per url (last-write-wins over (url, warc_ts) — D10 semantics)."""
    hits = store.docs(spark).where(F.col("url").isin(urls))
    w_newest = F.row_number().over(
        Window.partitionBy("url")
        .orderBy(F.col("warc_ts").desc(), F.col("doc_id").desc())
    )
    return (
        hits.withColumn("_rk", w_newest)
        .where(F.col("_rk") == 1)
        .select("url", "doc_id", "doc_len")
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# _count: match-query hit count served from the index
# ---------------------------------------------------------------------------


def count_query_store(
    spark: SparkSession, store, query_terms: list[str]
) -> DataFrame:
    """ES `_count` for a disjunctive match query, answered from the index:
    filter posting blocks to the query terms (pushed IN -> row-group
    skipping), decode the doc-id streams ONLY (`decode_postings_doc_ids` —
    tf/dl buffers never touched), distinct across terms, minus superseded
    doc versions. Returns one row (n_hits).

    The count never collects ids to the driver: distinct + count is a
    partial-aggregated shuffle of ids bounded by the query's postings, the
    same cardinality WAND's candidate set already has."""
    from engine.merge import live_doc_ids
    from engine.postings import decode_postings_doc_ids

    postings = store.postings(spark).where(F.col("term").isin(query_terms))
    ids = decode_postings_doc_ids(postings, codec=store.codec)
    if len(store.live_segments()) > 1:
        live = live_doc_ids(store.docs(spark)).select("doc_id")
        ids = ids.join(live, "doc_id", "left_semi")
    return ids.agg(F.count(F.lit(1)).alias("n_hits"))


def count_query_oracle_sql(
    query_terms: list[str], table: str = "documents", text_col: str = "text"
) -> str:
    toks = _DUCK_TOKS.format(col=text_col, pat=TOKEN_PATTERN)
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
        SELECT count(*) AS n_hits
        FROM (SELECT {toks} AS t FROM {table})
        WHERE list_has_any(t, [{terms}])
    """


# ---------------------------------------------------------------------------
# highlight: fragment extraction around the first query-term occurrence
# ---------------------------------------------------------------------------

_FRAG_CTX = 40  # chars of context either side of the match


def highlight_snippets(
    hits: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES-style highlight fragment for each hit row: the first query term
    (in query order) that occurs in the lowercased text, wrapped in
    <em>...</em> with up to 40 chars of context either side — the shape of
    ES's plain highlighter's first fragment.

    Contract (documented, shared with the oracle): the anchor is the first
    CHARACTER-level occurrence via strpos/instr on lower(text) — it can land
    inside a longer token ("spark" in "sparkly"), like a plain-highlighter
    fragment anchored on char offsets. Pure JVM string expressions
    (instr/substring/concat), whole-stage codegen, zero Python."""
    txt = F.lower(F.coalesce(F.col(text_col), F.lit("")))

    # first matching term in query order, and its 1-based position
    pos = F.lit(0)
    term = F.lit(None).cast("string")
    for t in reversed(query_terms):
        p = F.instr(txt, t)
        pos = F.when(p > 0, p).otherwise(pos)
        term = F.when(p > 0, F.lit(t)).otherwise(term)

    start = F.greatest(F.lit(1), pos - F.lit(_FRAG_CTX))
    frag = F.concat(
        F.substring(txt, start, pos - start),
        F.lit("<em>"),
        term,
        F.lit("</em>"),
        F.substring(txt, pos + F.length(term), F.lit(_FRAG_CTX)),
    )
    return hits.select(
        id_col,
        F.when(pos > 0, frag).alias("fragment"),
    )


def highlight_oracle_sql(
    query_terms: list[str],
    hits_cte: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of highlight_snippets over `hits_cte` (a CTE named
    `hits` selecting at least (id_col, text_col))."""
    txt = f"lower(coalesce({text_col}, ''))"
    pos = "0"
    term = "CAST(NULL AS VARCHAR)"
    for t in reversed(query_terms):
        p = f"strpos({txt}, '{t}')"
        pos = f"CASE WHEN {p} > 0 THEN {p} ELSE {pos} END"
        term = f"CASE WHEN {p} > 0 THEN '{t}' ELSE {term} END"
    return f"""
        WITH hits AS ({hits_cte}),
        m AS (
          SELECT {id_col}, {txt} AS txt, {pos} AS pos, {term} AS term
          FROM hits
        ),
        s AS (
          SELECT {id_col}, txt, pos, term,
                 greatest(1, pos - {_FRAG_CTX}) AS st
          FROM m
        )
        SELECT {id_col},
               CASE WHEN pos > 0 THEN
                 substr(txt, st, pos - st) || '<em>' || term || '</em>' ||
                 substr(txt, pos + length(term), {_FRAG_CTX})
               END AS fragment
        FROM s
    """
