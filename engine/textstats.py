"""Text analysis for large-scale training-data pipelines.

Beyond the reference's operator surface: the quality/language/token ops a
100 TB web-text pipeline needs in front of indexing or model training.
All hot paths are JVM-side column expressions (codegen, no Python); every
op has an exactly-matching DuckDB oracle expression (same regexes, same
lexicons) so the driver's value-hash check is strong.

Ops:
  - quality_features: length/punct/stopword/uppercase ratios, avg token len
  - token_count_bpe: whitespace + BPE-ish regex token counting
  - lang_id: stopword-lexicon n-gram heuristic (argmax over languages)
  - fingerprint: md5 of whitespace-normalized lowercased text (md5 is
    bit-identical between Spark and DuckDB -> strong oracle)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.analysis import tokens
from engine.config import SCORE_DECIMALS

# tiny per-language stopword lexicons (deterministic, shared with the oracle)
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "une", "dans", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "que", "una", "en", "por"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "von", "ein", "mit", "zu"],
}

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (GPT-2-style pretokenization simplified to a Java/RE2-shared subset)
BPE_RE = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"

PUNCT_RE = r"[^\p{L}\p{N}\s]"
UPPER_RE = r"[\p{Lu}]"


def _nz(x: Column) -> Column:
    return F.greatest(x, F.lit(1)).cast("double")


def punct_ratio_col(text_col: str = "text") -> Column:
    """Punctuation-to-chars ratio (rounded) — shared by quality_features
    and training_corpus so the signal has one definition."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), 0))
    return F.round(n_punct / _nz(F.length(t)), SCORE_DECIMALS)


def stopword_ratio_col(text_col: str = "text", lang: str = "en") -> Column:
    """Distinct-stopword-hits to total-tokens ratio (rounded) for `lang`'s
    lexicon — shared by quality_features and training_corpus."""
    toks = tokens(text_col)
    n_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_LEXICONS[lang]]))
    )
    return F.round(n_stop / _nz(F.size(toks)), SCORE_DECIMALS)


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals (all ratios rounded for oracle comparison)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_upper = F.size(F.regexp_extract_all(t, F.lit(UPPER_RE), 0))
    r = lambda c: F.round(c, SCORE_DECIMALS)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        r(n_chars / _nz(n_tokens)).alias("avg_token_len"),
        punct_ratio_col(text_col).alias("punct_ratio"),
        r(n_upper / _nz(n_chars)).alias("upper_ratio"),
        stopword_ratio_col(text_col, "en").alias("stopword_ratio"),
    )


def quality_features_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    stop = ", ".join(f"'{w}'" for w in LANG_LEXICONS["en"])
    return f"""
SELECT {id_col} AS doc_id,
  length(coalesce({text_col}, '')) AS n_chars,
  len(regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')) AS n_tokens,
  round(length(coalesce({text_col}, '')) / greatest(len(regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')), 1), {SCORE_DECIMALS}) AS avg_token_len,
  round(len(regexp_extract_all(coalesce({text_col}, ''), '{PUNCT_RE}')) / greatest(length(coalesce({text_col}, '')), 1), {SCORE_DECIMALS}) AS punct_ratio,
  round(len(regexp_extract_all(coalesce({text_col}, ''), '{UPPER_RE}')) / greatest(length(coalesce({text_col}, '')), 1), {SCORE_DECIMALS}) AS upper_ratio,
  round(len(list_intersect(list_distinct(regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')), [{stop}])) * 1.0 / greatest(len(regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')), 1), {SCORE_DECIMALS}) AS stopword_ratio
FROM {table}
"""


def token_count_bpe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish pre-token count (the 'how many tokens will training see' op)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0)).cast("long").alias("n_bpe_tokens"),
        F.size(F.split(F.trim(t), r"\s+")).cast("long").alias("n_ws_tokens"),
    )


def token_count_bpe_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col} AS doc_id,
  len(regexp_extract_all(coalesce({text_col}, ''), '{BPE_RE}')) AS n_bpe_tokens,
  len(regexp_split_to_array(trim(coalesce({text_col}, '')), '\\s+')) AS n_ws_tokens
FROM {table}
"""


def lang_pred_col(text_col: str = "text") -> Column:
    """The lang_id prediction as a reusable column expression (argmax over
    per-lang lexicon hit counts, 'und' when nothing matches, lexicographic
    tie-break) — shared by lang_id and the composed training_corpus
    pipeline so both stay one scan."""
    toks = F.array_distinct(tokens(text_col))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in lex])))
        for lang, lex in sorted(LANG_LEXICONS.items())
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_LEXICONS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic: argmax over per-lang lexicon hit
    counts; 'und' (undetermined) when nothing matches. Deterministic
    tie-break: lexicographic language order."""
    return df.select(
        F.col(id_col).alias("doc_id"), lang_pred_col(text_col).alias("lang_pred")
    )


def lang_id_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    toks = f"list_distinct(regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+'))"
    score = {
        lang: f"len(list_intersect({toks}, [{', '.join(repr(w) for w in lex)}]))"
        for lang, lex in sorted(LANG_LEXICONS.items())
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[lang]} = {best} THEN '{lang}'"
        for lang in sorted(LANG_LEXICONS)
    )
    return f"""
SELECT {id_col} AS doc_id,
  CASE WHEN {best} = 0 THEN 'und' {cases} ELSE 'und' END AS lang_pred
FROM {table}
"""


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 over lowercased, whitespace-normalized text
    (md5 is bit-identical across Spark/DuckDB — exact dedup key)."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " ")
    return df.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))


def fingerprint_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col} AS doc_id,
  md5(regexp_replace(lower(trim(coalesce({text_col}, ''))), '\\s+', ' ', 'g')) AS fp
FROM {table}
"""


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText-style
    quality filters for machine-generated or boilerplate text: the
    fraction of repeated tokens and of repeated token 3-grams inside each
    document (1 - distinct/total; 0.0 when fewer than one unit exists).

    Scale shape: pure JVM array expressions (sequence + transform +
    array_distinct) — per-doc local, shuffle-free, codegen; at any corpus
    size this is a map-only pass. A doc's n-gram list is O(doc length),
    never materialized across rows."""
    toks = tokens(text_col)
    n = F.size(toks)
    dup_tok = F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)) / n.cast("double"),
    ).otherwise(F.lit(0.0))
    # guard n < 3 explicitly: Spark's sequence(1, 0) counts DOWN ([1, 0]),
    # it does not produce an empty sequence
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(2)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + F.lit(1)),
                F.element_at(toks, i + F.lit(2)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ng = F.size(grams)
    dup_gram = F.when(
        ng > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / ng.cast("double"),
    ).otherwise(F.lit(0.0))
    r = lambda c: F.round(c, SCORE_DECIMALS)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        r(dup_tok).alias("dup_token_frac"),
        r(dup_gram).alias("dup_3gram_frac"),
    )


def repetition_stats_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')"
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
), g AS (
  SELECT doc_id, t,
         CASE WHEN len(t) >= 3 THEN
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ELSE [] END AS grams
  FROM t
)
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens,
  round(CASE WHEN len(t) > 0
        THEN 1.0 - len(list_distinct(t)) * 1.0 / len(t) ELSE 0.0 END, {SCORE_DECIMALS}) AS dup_token_frac,
  round(CASE WHEN len(grams) > 0
        THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams) ELSE 0.0 END, {SCORE_DECIMALS}) AS dup_3gram_frac
FROM g
"""


def unigram_logprob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """CCNet-style language-model quality score, the deterministic unigram
    subset: per-doc mean log-probability of its tokens under the corpus's
    OWN unigram distribution (p(t) = count(t) / total tokens), plus the
    perplexity exp(-mean). CCNet proper uses a pretrained KenLM 5-gram;
    the unigram corpus-self model is the deterministic, oracle-checkable
    stand-in with the same filtering shape (low mean logprob = gibberish /
    OOV-heavy / boilerplate-skewed docs).

    Scale shape: the unigram model is a (term, logp) relation derived from
    one token-count aggregate; scoring is a broadcast-joined second pass
    (vocab ≪ corpus) + one per-doc aggregate — two shuffles total, both
    key-partitioned, no driver-side model state."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    model = counts.crossJoin(F.broadcast(total)).select(
        "term", F.log(F.col("cnt") / F.col("total")).alias("logp")
    )
    return (
        toks.join(F.broadcast(model), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("logp"), SCORE_DECIMALS).alias("mean_logprob"),
            F.round(F.exp(-F.avg("logp")), SCORE_DECIMALS).alias("perplexity"),
        )
    )


def unigram_logprob_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')"
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}
), counts AS (
  SELECT term, count(*) AS cnt FROM t GROUP BY term
), total AS (
  SELECT sum(cnt) AS total FROM counts
), model AS (
  SELECT term, ln(cnt / total.total) AS logp FROM counts CROSS JOIN total
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(m.logp), {SCORE_DECIMALS}) AS mean_logprob,
       round(exp(-avg(m.logp)), {SCORE_DECIMALS}) AS perplexity
FROM t JOIN model m USING (term)
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# model-based quality filtering + tf-idf keyword extraction
# ---------------------------------------------------------------------------

# Fixed, documented weights for the linear quality model — the deterministic
# stand-in for a fasttext-style quality classifier (the real pipeline would
# train these; the ENGINE contract is the scoring plan, not the weights).
QUALITY_WEIGHTS = {
    "stopword_ratio": 2.0,   # English function words -> prose-like
    "punct_ratio": -3.0,     # symbol soup -> boilerplate/code
    "upper_ratio": -1.0,     # SHOUTING / headers
    "len_per_500": 2.0,      # length prior, saturates at 500 tokens
    "bias": -0.5,
}


def quality_classifier(
    df: DataFrame, threshold: float = 0.5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, quality_score, keep): logistic quality model over the
    engineered features — sigmoid(w . x + b) with QUALITY_WEIGHTS, `keep`
    = score >= threshold. The model-based filtering stage of a training
    pipeline (CCNet/fasttext shape) with a deterministic linear model.

    Plan: quality_features is a pure codegen scan; the score adds column
    arithmetic on top — still zero shuffles, linear in corpus bytes."""
    w = QUALITY_WEIGHTS
    feats = quality_features(df, text_col=text_col, id_col=id_col)
    z = (
        F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["upper_ratio"]) * F.col("upper_ratio")
        + F.lit(w["len_per_500"]) * F.least(F.col("n_tokens"), F.lit(500)) / 500.0
        + F.lit(w["bias"])
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), SCORE_DECIMALS)
    return feats.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= F.lit(threshold)).cast("int").alias("keep"),
    )


def quality_classifier_oracle_sql(
    threshold: float = 0.5, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    w = QUALITY_WEIGHTS
    inner = quality_features_oracle_sql(table, text_col, id_col)
    return f"""
WITH feats AS ({inner})
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(
         {w["stopword_ratio"]} * stopword_ratio
         + {w["punct_ratio"]} * punct_ratio
         + {w["upper_ratio"]} * upper_ratio
         + {w["len_per_500"]} * least(n_tokens, 500) / 500.0
         + {w["bias"]}))), {SCORE_DECIMALS}) AS quality_score,
       CAST(round(1.0 / (1.0 + exp(-(
         {w["stopword_ratio"]} * stopword_ratio
         + {w["punct_ratio"]} * punct_ratio
         + {w["upper_ratio"]} * upper_ratio
         + {w["len_per_500"]} * least(n_tokens, 500) / 500.0
         + {w["bias"]}))), {SCORE_DECIMALS}) >= {threshold} AS INT) AS keep
FROM feats
"""


def tfidf_keywords(
    docs: DataFrame, top_k: int = 5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, tfidf, rank): each doc's top-`top_k` terms by
    tf * ln(n_docs / df) — classic tf-idf keyword extraction (the cheap
    document-labeling pass of a corpus pipeline). Ties break by term asc.

    Plan: ONE tf shuffle (doc_id, term), a vocabulary-bounded df aggregate
    broadcast back, then the per-doc top-k as row_number() <= k — which
    Spark 4 compiles to the map-side WindowGroupLimit pair, so a long doc
    ships at most k rows per partition past the partial limit."""
    from engine.analysis import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            F.round(
                F.col("tf") * F.log(F.col("n") / F.col("df")), SCORE_DECIMALS
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def tfidf_keywords_oracle_sql(
    top_k: int = 5, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n FROM {table}),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(n.n * 1.0 / df), {SCORE_DECIMALS}) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {top_k}
"""


def bigram_lm(
    df: DataFrame, top_n: int | None = None,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """TRAIN a bigram language model on the corpus itself: (w1, w2, cnt,
    cond_logp) where cond_logp = ln(count(w1 w2) / count(w1 as prefix)) —
    the conditional MLE the KenLM-style CCNet filter builds (restricted to
    order 2 so both engines reproduce it exactly). `top_n` returns the
    most frequent bigrams (cnt desc, w1/w2 asc tie-break).

    Scale shape: bigram extraction is partition-local (zip each token
    array with its shifted self — no shuffle); counts are ONE hash
    aggregate keyed by (w1, w2); the prefix totals reuse the same relation
    grouped by w1 (vocabulary-bounded) and broadcast back."""
    t = tokens(text_col)
    pairs = (
        df.select(t.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, F.size("_t") - 1).alias("w1"),
                    F.slice("_t", 2, F.size("_t") - 1).alias("w2"),
                )
            ).alias("_p")
        )
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = counts.groupBy("w1").agg(F.sum("cnt").alias("_c1"))
    model = (
        counts.join(F.broadcast(prefix), "w1")
        .select(
            "w1", "w2", "cnt",
            F.round(F.log(F.col("cnt") / F.col("_c1")), SCORE_DECIMALS)
            .alias("cond_logp"),
        )
    )
    if top_n is None:
        return model.orderBy("w1", "w2")
    return model.orderBy(
        F.col("cnt").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_n)


def bigram_lm_oracle_sql(
    top_n: int | None = None, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')"
    order = (
        "ORDER BY w1, w2"
        if top_n is None
        else f"ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT {top_n}"
    )
    return f"""
WITH t AS (SELECT {toks} AS t FROM {table}),
pairs AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i)
  WHERE len(t) >= 2
),
counts AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2),
prefix AS (SELECT w1, sum(cnt) AS c1 FROM counts GROUP BY w1)
SELECT counts.w1, counts.w2, counts.cnt,
       round(ln(counts.cnt * 1.0 / prefix.c1), {SCORE_DECIMALS}) AS cond_logp
FROM counts JOIN prefix USING (w1)
{order}
"""


def bigram_perplexity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score each doc under the corpus-trained bigram model: per-doc mean
    conditional log-prob over its bigrams and the perplexity exp(-mean) —
    the CCNet filtering signal with a conditional (order-2) model instead
    of unigram_logprob's order-1. Every bigram is in-model by construction
    (the model is trained on this corpus), so no smoothing is needed;
    docs shorter than 2 tokens are excluded (no bigrams to score).

    Scale shape: train + score in one lineage — the model relation is
    vocabulary^2-bounded and broadcast back onto the partition-local
    bigram stream; two hash aggregates total."""
    t = tokens(text_col)
    doc_pairs = (
        df.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, F.size("_t") - 1).alias("w1"),
                    F.slice("_t", 2, F.size("_t") - 1).alias("w2"),
                )
            ).alias("_p"),
        )
        .select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    # exact (un-rounded) conditional logp recomputed from the same bigram
    # stream: rounding belongs at the OUTPUT, not inside the mean
    counts = doc_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = counts.groupBy("w1").agg(F.sum("cnt").alias("_c1"))
    logp = counts.join(F.broadcast(prefix), "w1").select(
        "w1", "w2", F.log(F.col("cnt") / F.col("_c1")).alias("_lp")
    )
    return (
        doc_pairs.join(F.broadcast(logp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("_lp"), SCORE_DECIMALS).alias("mean_logprob"),
            F.round(F.exp(-F.avg("_lp")), SCORE_DECIMALS).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


def bigram_perplexity_oracle_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '[\\p{{L}}\\p{{N}}]+')"
    return f"""
WITH t AS (SELECT {id_col} AS doc_id, {toks} AS t FROM {table}),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i)
  WHERE len(t) >= 2
),
counts AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2),
prefix AS (SELECT w1, sum(cnt) AS c1 FROM counts GROUP BY w1),
logp AS (
  SELECT counts.w1, counts.w2, ln(counts.cnt * 1.0 / prefix.c1) AS lp
  FROM counts JOIN prefix USING (w1)
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(lp), {SCORE_DECIMALS}) AS mean_logprob,
       round(exp(-avg(lp)), {SCORE_DECIMALS}) AS perplexity
FROM pairs JOIN logp USING (w1, w2)
GROUP BY doc_id
ORDER BY doc_id
"""
