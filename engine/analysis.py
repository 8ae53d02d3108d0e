"""Text analysis chain: extract -> tokenize.

Re-implements, natively, the analysis the reference delegates to
Elasticsearch 5.5's `standard` analyzer (anchor: the pinned dependency
/root/reference/build.gradle:42 and the verbatim `_source` set at
/root/reference/src/main/java/org/elasticsearch/kafka/indexer/service/ElasticSearchBatchService.java:60):
Unicode word segmentation + lowercase, no stopword removal.

Also hosts the pluggable per-record transform seam — the reference's whole
UDF surface is IMessageHandler.transformMessage(String, Long) -> String
(/root/reference/src/main/java/org/elasticsearch/kafka/indexer/service/IMessageHandler.java:18),
identity in the shipped impl (SimpleMessageHandlerImpl.java:30-33). Here the
transform is `extract_text` (html -> text), a vectorized pandas UDF with the
reference's per-record error isolation (ConsumerWorker.java:81-92: a failing
record is skipped + quarantined, the batch continues).

Design notes (scale):
- Tokenization is pure JVM (`regexp_extract_all` + `lower`) so it stays
  inside whole-stage codegen — no Python in the hot indexing path.
- `extract_text` is Arrow-batched (pandas UDF), never per-row Python.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from engine.config import TOKEN_PATTERN

# ---------------------------------------------------------------------------
# Tokenizer (JVM-side, codegen-friendly)
# ---------------------------------------------------------------------------


def tokens(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """`text -> array<string>` of lowercased Unicode word tokens.

    Equivalent DuckDB oracle expression:
        regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')
    Both Java regex and RE2 support \\p{L}/\\p{N} with identical semantics
    on these classes, so Spark and the oracle produce identical token
    streams (the frozen-token-stream invariant everything downstream
    depends on, SURVEY.md §7.2 step 1).
    """
    c = F.col(col) if isinstance(col, str) else col
    # coalesce: null text tokenizes to [] (and doc_len 0), matching
    # py_tokenize and the oracle SQL's coalesce(text, '').
    return F.regexp_extract_all(F.lower(F.coalesce(c, F.lit(""))), F.lit(pattern), 0)


def doc_len(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Token count of a text column (BM25 |d|). Empty/null text -> 0."""
    return F.size(tokens(col, pattern))


# Python-side twin of `tokens` for oracles/tests (exact same semantics).
# \w in Python covers [\p{L}\p{N}_]; we must exclude '_' to match
# [\p{L}\p{N}]+ exactly, so spell the classes out via the regex module's
# unicode properties emulation: Python re lacks \p{..}, use a class built
# from str methods instead.
_PY_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)  # == [\p{L}\p{N}]+ (letters+digits, no _)


def py_tokenize(text: str | None) -> list[str]:
    """Reference/oracle tokenizer: identical output to `tokens` column."""
    if text is None:
        return []
    return _PY_TOKEN_RE.findall(text.lower())


# ---------------------------------------------------------------------------
# extract_text: the pluggable transform (T1) for the webpages corpus
# ---------------------------------------------------------------------------

# The synthetic Common-Crawl-style corpus (engine/corpus.py) wraps `text` as
#   <html><head><title>..</title></head><body><p>{text}</p></body></html>
# extract_text must reproduce `text` byte-identically (BASELINE.json
# input_hint invariant). Extraction failures (no <p> block / undecodable
# bytes) yield error != NULL and are quarantined by the caller.
_P_BLOCK = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


def _extract_one(html: bytes | None) -> tuple[str | None, str | None]:
    if html is None:
        return None, "null html"
    m = _P_BLOCK.search(html)
    if m is None:
        return None, "no <p> block"
    try:
        return m.group(1).decode("utf-8"), None
    except UnicodeDecodeError as e:
        return None, f"undecodable: {e.reason}"


_EXTRACT_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("error", StringType()),
        StructField("n_tokens", IntegerType()),
    ]
)


@pandas_udf(_EXTRACT_SCHEMA)
def extract_text(html: pd.Series) -> pd.DataFrame:
    """Vectorized html->text extraction with per-record error isolation.

    Python (not a JVM column) for two reasons: Spark's decode() substitutes
    U+FFFD instead of failing, which would break the byte-identical-text
    invariant AND the quarantine semantics; and n_tokens (BM25 |d|) rides
    along from Python's C regex, which is ~7x faster than Java's \\p{L}
    classes (measured; py_tokenize == the JVM `tokens` column, tested)."""
    out = []
    for h in html:
        text, err = _extract_one(h)
        out.append((text, err, len(py_tokenize(text)) if err is None else None))
    return pd.DataFrame(out, columns=["text", "error", "n_tokens"])


def with_extracted_text(df, html_col: str = "html"):
    """Adds `extracted_text`/`extract_error`/`n_tokens` columns from `html_col`.

    Caller splits: `where(error IS NULL)` -> pipeline,
    `where(error IS NOT NULL)` -> quarantine (reference S13 semantics,
    FailedEventsLogger.java:18-21).
    """
    ext = extract_text(F.col(html_col))
    return (
        df.withColumn("_ext", ext)
        .withColumn("extracted_text", F.col("_ext.text"))
        .withColumn("extract_error", F.col("_ext.error"))
        .withColumn("n_tokens", F.col("_ext.n_tokens"))
        .drop("_ext")
    )
