"""training_corpus: the composed LLM-training-data cleaning pipeline —
language filter + quality gate + exact dedup in ONE declarative plan.

Each piece exists as its own oracled operator (engine/textstats.py,
engine/dedup.py, engine/clusters.py); this module is the composition a
real pipeline runs nightly over a crawl: keep documents that (a) are the
target language, (b) pass quality thresholds, (c) are the canonical copy
of their exact-duplicate group. The C4/RefinedWeb-style recipe, minus the
model-based filters (the near-dup upgrade path is the separate
minhash -> dedup_clusters operators).

100 TB shape — why composition matters, not just the pieces:
- lang + ALL quality signals + the dedup fingerprint are computed in ONE
  projection over ONE parquet scan (shared subexpressions, codegen);
  composing via joins of the standalone operators would scan the corpus
  once per feature.
- the language/quality FILTER runs before the dedup shuffle, so the
  groupBy(fingerprint) moves only surviving docs.
- canonical selection is the WindowGroupLimit pattern (row_number()<=1
  per fingerprint): a boilerplate page duplicated a million times ships
  <=1 row per partition into the shuffle, not a million.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.analysis import tokens
from engine.config import SCORE_DECIMALS, TOKEN_PATTERN
from engine.textstats import LANG_LEXICONS, PUNCT_RE, lang_pred_col


def training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Kept documents with their features: (doc_id, lang_pred, n_tokens,
    stopword_ratio). A doc is kept iff predicted language == `lang`,
    min_tokens <= n_tokens <= max_tokens, punct_ratio <= max_punct_ratio,
    stopword_ratio >= min_stopword_ratio (measured against `lang`'s OWN
    stopword lexicon — a French pipeline gates on French stopwords), and
    it is the smallest doc_id of its exact-content group (md5 over
    lowercased whitespace-normalized text).

    The quality signals are the SAME column expressions quality_features
    publishes (engine/textstats.py punct_ratio_col / stopword_ratio_col) —
    one definition, no drift."""
    if lang not in LANG_LEXICONS:
        raise ValueError(
            f"no stopword lexicon for lang={lang!r}; known: {sorted(LANG_LEXICONS)}"
        )
    from engine.textstats import punct_ratio_col, stopword_ratio_col

    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.size(tokens(text_col)).cast("long")
    punct_ratio = punct_ratio_col(text_col)
    stopword_ratio = stopword_ratio_col(text_col, lang)
    fp = F.md5(F.regexp_replace(F.lower(F.trim(t)), r"\s+", " "))
    feats = docs.select(
        F.col(id_col).alias("doc_id"),
        lang_pred_col(text_col).alias("lang_pred"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        fp.alias("fp"),
    ).where(
        (F.col("lang_pred") == F.lit(lang))
        & F.col("n_tokens").between(int(min_tokens), int(max_tokens))
        & (F.col("punct_ratio") <= F.lit(float(max_punct_ratio)))
        & (F.col("stopword_ratio") >= F.lit(float(min_stopword_ratio)))
    )
    canonical = F.row_number().over(
        Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    )
    return (
        feats.withColumn("_rk", canonical)
        .where(F.col("_rk") == 1)
        .select("doc_id", "lang_pred", "n_tokens", "stopword_ratio")
    )


def stratified_sample(
    spark: SparkSession,
    docs: DataFrame,
    rates: dict[str, float],
    strat_col: str = "lang",
    seed: str = "s1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling — the corpus-mixing step of a
    training-data pipeline (e.g. keep 100% of en, 30% of fr, 10% of the
    rest). NOT RNG-based: the keep decision is a pure function of
    (seed, doc_id) — u = first 60 bits of md5(seed:doc_id) / 2^60 < rate —
    so the sample is reproducible run-to-run, identical at ANY parallelism
    (the north rule's two-cluster-size identity), resumable without state,
    and the oracle regenerates it exactly (md5 is bit-identical in Spark
    and DuckDB). `rates`: strat value -> keep fraction; values not listed
    use rates.get('*', 0.0). Returns kept (doc_id, strat_col, u)."""
    from engine.dedup import md5_60bit

    u = md5_60bit(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    ).cast("double") / F.lit(float(1 << 60))
    default = float(rates.get("*", 0.0))
    rate = F.lit(default)
    for val, frac in sorted(rates.items()):
        if val == "*":
            continue
        rate = F.when(F.col(strat_col) == F.lit(val), F.lit(float(frac))).otherwise(rate)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(strat_col),
            F.round(u, SCORE_DECIMALS).alias("u"),
        )
        .where(u < rate)
    )


def stratified_sample_oracle_sql(
    rates: dict[str, float],
    strat_col: str = "lang",
    seed: str = "s1",
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    u = (
        f"(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT"
        f" / {float(1 << 60)})"
    )
    default = float(rates.get("*", 0.0))
    cases = " ".join(
        f"WHEN {strat_col} = '{val}' THEN {float(frac)}"
        for val, frac in sorted(rates.items())
        if val != "*"
    )
    # CASE with no WHEN arms is invalid SQL — default-only rates become a
    # plain literal (the engine's when-chain degenerates identically)
    rate_expr = f"(CASE {cases} ELSE {default} END)" if cases else str(default)
    return f"""
SELECT {id_col} AS doc_id, {strat_col}, round({u}, {SCORE_DECIMALS}) AS u
FROM {table}
WHERE {u} < {rate_expr}
"""


def training_corpus_oracle_sql(
    lang: str = "en",
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.01,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    if lang not in LANG_LEXICONS:
        raise ValueError(
            f"no stopword lexicon for lang={lang!r}; known: {sorted(LANG_LEXICONS)}"
        )
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOKEN_PATTERN}')"
    stop = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
    score = {
        lg: f"len(list_intersect(list_distinct({toks}), [{', '.join(repr(w) for w in lex)}]))"
        for lg, lex in sorted(LANG_LEXICONS.items())
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[lg]} = {best} THEN '{lg}'" for lg in sorted(LANG_LEXICONS)
    )
    return f"""
WITH f AS (
  SELECT {id_col} AS doc_id,
    CASE WHEN {best} = 0 THEN 'und' {cases} ELSE 'und' END AS lang_pred,
    len({toks}) AS n_tokens,
    round(len(regexp_extract_all(coalesce({text_col}, ''), '{PUNCT_RE}')) / greatest(length(coalesce({text_col}, '')), 1), {SCORE_DECIMALS}) AS punct_ratio,
    round(len(list_intersect(list_distinct({toks}), [{stop}])) * 1.0 / greatest(len({toks}), 1), {SCORE_DECIMALS}) AS stopword_ratio,
    md5(regexp_replace(lower(trim(coalesce({text_col}, ''))), '\\s+', ' ', 'g')) AS fp
  FROM {table}
), kept AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rk
  FROM f
  WHERE lang_pred = '{lang}'
    AND n_tokens BETWEEN {int(min_tokens)} AND {int(max_tokens)}
    AND punct_ratio <= {float(max_punct_ratio)}
    AND stopword_ratio >= {float(min_stopword_ratio)}
)
SELECT doc_id, lang_pred, n_tokens, stopword_ratio
FROM kept WHERE rk = 1
"""
