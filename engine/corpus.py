"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema matches BASELINE.json's input hint
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)
plus a `row_id: long` lineage column (the Kafka offset analog the ingest
loop partitions on; reference envelope ConsumerWorker.java:69-72).

Every row is a pure function of its row id (splitmix64-mixed), so the
corpus is byte-identical regardless of Spark parallelism or partitioning —
the property the local[8]-vs-local[32] scaling bench and the deterministic
doc-id tests rely on. Generation is distributed (mapInPandas over
spark.range) and fully numpy-vectorized per Arrow batch: at 10^12-doc scale
this generator is itself an embarrassingly parallel Spark job.

Token distribution is Zipfian over a ~5k-word vocabulary with one
deliberately hot term (`VOCAB[0]`, in ~90% of docs) for the skew tests
(SURVEY.md §5.2-5). Special rows at fixed ids exercise the edge paths:
  id 0: empty text             id 1: single token
  id 2: non-ASCII text         id 3: html without a <p> block (quarantine,
                                     reference ConsumerWorker.java:86-92)
  id 5: duplicate url of id 4 with a later warc_ts (last-write-wins, D10)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = (
    "row_id long, url string, warc_ts timestamp, html binary, text string, lang string"
)

HOT_TERM = "engine"  # VOCAB[0]; forced into ~90% of documents

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu",
]
_SEED_WORDS = [
    HOT_TERM, "index", "spark", "query", "shard", "merge", "token",
    "crawl", "page", "rank", "score", "batch", "offset", "commit",
    "schnell", "héllo", "日本",  # non-ASCII vocabulary entries
]


def build_vocab(size: int = 5000) -> list[str]:
    """Deterministic vocabulary: seed words then 3-syllable pseudo-words."""
    vocab = list(_SEED_WORDS)
    i = 0
    while len(vocab) < size:
        a, b, c = (i // 400) % 20, (i // 20) % 20, i % 20
        vocab.append(_SYLLABLES[a] + _SYLLABLES[b] + _SYLLABLES[c])
        i += 1
    return vocab[:size]


_ZIPF_S = 1.07


def _zipf_cdf(n: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), _ZIPF_S)
    return np.cumsum(w) / w.sum()


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized; input/output uint64."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return _mix64(x).astype(np.float64) / float(2**64)


_LANGS = np.array(["en", "fr", "es", "zh", "de"])
_LANG_CDF = np.array([0.60, 0.72, 0.84, 0.93, 1.00])

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def generate_batch(ids: np.ndarray, vocab: list[str], cdf: np.ndarray) -> pd.DataFrame:
    """Rows for the given row-ids; pure function of ids (vectorized)."""
    ids = ids.astype(np.uint64)
    n = len(ids)

    # doc length in tokens: 20..600 uniform (special rows overridden below)
    lens = (20 + _mix64(ids ^ np.uint64(0xA5A5)) % np.uint64(581)).astype(np.int64)
    lens[ids == 0] = 0
    lens[ids == 1] = 1
    lens[ids == 2] = 8

    # token sampling: u(i, j) -> Zipf rank via inverse CDF
    doc_idx = np.repeat(np.arange(n), lens)
    tok_pos = np.arange(len(doc_idx), dtype=np.uint64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.uint64), lens
    )
    key = ids[doc_idx] * np.uint64(0x100000001B3) + tok_pos * np.uint64(0x1B873593)
    u = _u01(key)
    # Zipf over vocab[1:]; rank 0 (HOT_TERM) enters only via injection below,
    # so its document frequency is exactly the injected ~90%
    ranks = 1 + np.searchsorted(cdf, u, side="left")

    # hot-term injection: ~90% of docs get VOCAB[0] at position 0
    hot_doc = (_mix64(ids ^ np.uint64(0x707)) % np.uint64(10)) < np.uint64(9)
    first_pos = tok_pos == 0
    ranks[first_pos & hot_doc[doc_idx] & (lens[doc_idx] > 1)] = 0

    vocab_arr = np.array(vocab)
    words = vocab_arr[ranks]
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(ws) for ws in np.split(words, bounds)]
    # non-ASCII special row
    if (ids == 2).any():
        texts[int(np.where(ids == 2)[0][0])] = "héllo wörld straße 日本語 データ émission naïve café"

    # url: dup pair (5 -> url of 4) for last-write-wins tests
    url_ids = ids.copy()
    url_ids[ids == 5] = 4
    sites = (url_ids % np.uint64(1000)).astype(np.int64)
    urls = [
        f"https://site{s}.example/page/{p}"
        for s, p in zip(sites, url_ids.astype(np.int64))
    ]

    # warc_ts: monotone-ish from 2024-01-01 with jitter; dup row strictly later
    secs = ids.astype(np.int64) * 17 + (
        _mix64(ids ^ np.uint64(0xBEEF)) % np.uint64(86400)
    ).astype(np.int64)
    secs = np.where(ids == 5, secs + 10_000_000, secs)
    warc_ts = _EPOCH_2024 + secs.astype("timedelta64[s]").astype("timedelta64[us]")

    lang_u = _u01(ids ^ np.uint64(0x1A96))
    langs = _LANGS[np.searchsorted(_LANG_CDF, lang_u, side="left")]

    html = [
        f"<html><head><title>p{int(i)}</title></head><body><p>{t}</p></body></html>".encode()
        for i, t in zip(ids, texts)
    ]
    # quarantine special row: html without <p>
    if (ids == 3).any():
        j = int(np.where(ids == 3)[0][0])
        html[j] = b"<html><head><title>p3</title></head><body>no paragraph here</body></html>"

    return pd.DataFrame(
        {
            "row_id": ids.astype(np.int64),
            "url": urls,
            "warc_ts": pd.Series(warc_ts),
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


def webpages(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 5000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus of `n_docs` pages."""
    vocab = build_vocab(vocab_size)
    cdf = _zipf_cdf(len(vocab) - 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield generate_batch(b["id"].to_numpy(), vocab, cdf)

    rng = spark.range(0, n_docs, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)


def webpages_pandas(n_docs: int, vocab_size: int = 5000) -> pd.DataFrame:
    """Driver-side twin for small fixtures/oracles (identical rows)."""
    vocab = build_vocab(vocab_size)
    cdf = _zipf_cdf(len(vocab) - 1)
    return generate_batch(np.arange(n_docs, dtype=np.uint64), vocab, cdf)
