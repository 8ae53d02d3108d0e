"""Training-corpus preparation operators for large-scale web-text pipelines.

Beyond the reference's surface (it only ships raw messages to ES —
/root/reference/src/main/java/org/elasticsearch/kafka/indexer/service/
ElasticSearchBatchService.java:60): the corpus-cleaning passes an LLM
training pipeline runs between crawl and tokenizer, re-expressed as
single-purpose Spark plans with exactly-matching DuckDB oracles.

Ops:
  - token_chunks:  overlapping token-window chunking (context-window prep)
  - chunk_dedup:   C4-style span dedup — remove every repeated token chunk
                   corpus-wide except its first occurrence, reassemble docs
  - pii_redact:    email/phone/IPv4 scrubbing with per-type counts
  - contamination: benchmark n-gram overlap detection (decontamination)

Scale notes per op are in the docstrings; the common theme: everything is
JVM column expressions + bounded shuffles keyed by high-cardinality hashes,
with the benchmark side of contamination broadcast (benchmarks are MB-sized
while the corpus is TB-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.analysis import tokens
from engine.config import SCORE_DECIMALS, TOKEN_PATTERN
from engine.dedup import shingles

_DUCK_TOKS = "regexp_extract_all(lower(coalesce({col}, '')), '{pat}')"


# ---------------------------------------------------------------------------
# token-window chunking (training context-window preparation)
# ---------------------------------------------------------------------------


def token_chunks(
    df: DataFrame, window: int = 50, stride: int = 40,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_len, chunk_text): overlapping token windows
    of `window` tokens every `stride` tokens — the standard packing pass
    before tokenizer sharding. The final partial window is kept (training
    pipelines pad it); empty docs produce no chunks.

    Plan: tokenize + per-doc `sequence`/`transform` (JVM, codegen) then one
    posexplode — no shuffle at all; chunking is embarrassingly parallel and
    stays partition-local at any corpus size.
    """
    t = tokens(text_col)
    starts = F.sequence(F.lit(0), F.greatest(F.size("_t") - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice("_t", s + 1, window))
    return (
        df.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
        .where(F.size("_t") > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "_c"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size("_c").cast("long").alias("chunk_len"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )


def token_chunks_oracle_sql(
    window: int = 50, stride: int = 40, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    toks = _DUCK_TOKS.format(col=text_col, pat=TOKEN_PATTERN)
    return f"""
WITH t AS (SELECT {id_col} AS doc_id, {toks} AS t FROM {table}),
starts AS (
  SELECT doc_id, t,
         unnest(range(1, greatest(len(t) - 1, 0) + 2, {stride})) AS s,
         generate_subscripts(range(1, greatest(len(t) - 1, 0) + 2, {stride}), 1) - 1
           AS chunk_idx
  FROM t WHERE len(t) > 0
)
SELECT doc_id, chunk_idx,
       CAST(len(t[s:s + {window - 1}]) AS BIGINT) AS chunk_len,
       array_to_string(t[s:s + {window - 1}], ' ') AS chunk_text
FROM starts
"""


# ---------------------------------------------------------------------------
# C4-style corpus-wide span dedup
# ---------------------------------------------------------------------------


def chunk_dedup(
    df: DataFrame, chunk_tokens: int = 10,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """C4-style span dedup (Raffel et al. 2020 dedup the corpus on
    three-sentence spans; this synthetic corpus has no sentence marks, so
    the span unit is a disjoint `chunk_tokens`-token chunk): every chunk
    whose text occurs anywhere earlier in the corpus — in another doc or
    earlier in the same doc — is removed; the globally-first occurrence
    (smallest (doc_id, chunk_idx)) is kept. Docs are reassembled from their
    surviving chunks.

    Returns (doc_id, n_chunks, n_removed, clean_text).

    Plan: tokenize + disjoint chunking stay partition-local; the keep
    decision is min(struct(doc_id, chunk_idx)) grouped by md5(chunk) — a
    HASH AGGREGATE with map-side partial min, so a chunk duplicated a
    million times (hot boilerplate, the whole point of C4 dedup) reduces
    to one row per partition BEFORE its shuffle; the winners relation
    (unique per hash) then equi-joins back. A window row_number here would
    sort every copy of the hot chunk in one partition — the skew shape
    this op exists to avoid. Reassembly is one groupBy(doc_id). Three
    bounded shuffles total, all keyed by high-cardinality md5 or doc_id.
    """
    t = tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_t") - 1, F.lit(0)), F.lit(chunk_tokens)
    )
    chunks = F.transform(starts, lambda s: F.slice("_t", s + 1, chunk_tokens))
    exploded = (
        df.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
        .where(F.size("_t") > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "_c"))
        .select(
            "doc_id", "chunk_idx",
            F.array_join("_c", " ").alias("chunk_text"),
            F.md5(F.array_join("_c", " ")).alias("_h"),
        )
    )
    winners = exploded.groupBy("_h").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("_w")
    )
    kept = exploded.join(winners, "_h").withColumn(
        "_keep",
        (
            (F.col("doc_id") == F.col("_w.doc_id"))
            & (F.col("chunk_idx") == F.col("_w.chunk_idx"))
        ).cast("int"),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            (F.count(F.lit(1)) - F.sum("_keep")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep") == 1,
                                F.struct("chunk_idx", "chunk_text"),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select("doc_id", "n_chunks", "n_removed", "clean_text")
    )


def chunk_dedup_oracle_sql(
    chunk_tokens: int = 10, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    toks = _DUCK_TOKS.format(col=text_col, pat=TOKEN_PATTERN)
    return f"""
WITH t AS (SELECT {id_col} AS doc_id, {toks} AS t FROM {table}),
starts AS (
  SELECT doc_id, t,
         unnest(range(1, greatest(len(t) - 1, 0) + 2, {chunk_tokens})) AS s,
         generate_subscripts(range(1, greatest(len(t) - 1, 0) + 2, {chunk_tokens}), 1)
           - 1 AS chunk_idx
  FROM t WHERE len(t) > 0
),
ch AS (
  SELECT doc_id, chunk_idx,
         array_to_string(t[s:s + {chunk_tokens - 1}], ' ') AS chunk_text
  FROM starts
),
ranked AS (
  SELECT doc_id, chunk_idx, chunk_text,
         row_number() OVER (PARTITION BY md5(chunk_text)
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
)
SELECT doc_id,
       count(*) AS n_chunks,
       count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_removed,
       coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' '
                           ORDER BY chunk_idx), '') AS clean_text
FROM ranked
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex/RE2 shared subset (no backrefs, no
# lookaround) so Spark and the DuckDB oracle compile them identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, redacted): scrub emails, phone
    numbers, and IPv4 addresses to typed placeholder tags, with per-type
    match counts. Emails are replaced first so an address's host part can't
    be re-matched as an IP fragment; each count is taken at its own pass
    (i.e. n_ips counts IPs that survive the email pass), so the counts sum
    to the number of tags in `redacted`.

    Plan: six regexp passes per row, all JVM codegen — no shuffle, no
    Python; scales linearly with corpus bytes like any scan-only pass.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    red = F.regexp_replace(after_phone, IPV4_RE, "<IP>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(PHONE_RE), 0)).cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(after_phone, F.lit(IPV4_RE), 0)).cast("long")
        .alias("n_ips"),
        red.alias("redacted"),
    )


def pii_redact_oracle_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    t = f"coalesce({text_col}, '')"
    return f"""
WITH staged AS (
  SELECT {id_col} AS doc_id, {t} AS t0,
         regexp_replace({t}, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM {table}
),
staged2 AS (
  SELECT doc_id, t0, t1,
         regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g') AS t2
  FROM staged
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t0, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t2, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(t2, '{IPV4_RE}', '<IP>', 'g') AS redacted
FROM staged2
"""


# ---------------------------------------------------------------------------
# benchmark contamination detection
# ---------------------------------------------------------------------------


def contamination(
    train: DataFrame, bench: DataFrame, k: int = 8,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hits, n_shingles, hit_ratio): training docs sharing at
    least one word `k`-gram with any benchmark doc — the standard
    decontamination check (GPT-3 used 13-gram overlap; `k` is a knob).
    `n_hits` counts the doc's DISTINCT contaminated shingles.

    Plan: both sides shingle partition-locally; the benchmark side —
    MB-sized eval sets vs a TB-sized corpus — is `F.broadcast` joined, so
    the corpus never shuffles: scan -> shingle -> broadcast-hash-join ->
    partial agg. The distinct benchmark shingle set is what ships.
    """
    tr = shingles(train, k=k, text_col=text_col, id_col=id_col)
    bn = (
        shingles(bench, k=k, text_col=text_col, id_col=id_col)
        .select("shingle").distinct()
    )
    sizes = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        tr.join(F.broadcast(bn), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_hits",
            "n_shingles",
            F.round(F.col("n_hits") / F.col("n_shingles"), SCORE_DECIMALS)
            .alias("hit_ratio"),
        )
        .orderBy("doc_id")
    )


def contamination_oracle_sql(
    train_pred: str, bench_pred: str, k: int = 8, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """`train_pred` / `bench_pred` are SQL predicates over `table` selecting
    the two sides (the driver query splits one table deterministically)."""
    toks = _DUCK_TOKS.format(col=text_col, pat=TOKEN_PATTERN)
    return f"""
WITH t AS (SELECT {id_col} AS doc_id, {toks} AS t, {train_pred} AS is_train,
                  {bench_pred} AS is_bench
           FROM {table}),
idx AS (
  SELECT doc_id, t, is_train, is_bench, unnest(range(1, len(t) - {k} + 2)) AS i
  FROM t WHERE len(t) >= {k}
),
sh AS (
  SELECT DISTINCT doc_id, is_train, is_bench,
         array_to_string(t[i:i+{k - 1}], ' ') AS shingle
  FROM idx
),
bn AS (SELECT DISTINCT shingle FROM sh WHERE is_bench),
tr AS (SELECT doc_id, shingle FROM sh WHERE is_train),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM tr JOIN bn USING (shingle)
  GROUP BY doc_id
)
SELECT doc_id, n_hits, n_shingles,
       round(n_hits / n_shingles, {SCORE_DECIMALS}) AS hit_ratio
FROM hits JOIN sizes USING (doc_id)
ORDER BY doc_id
"""
