"""Slow exact BM25 oracle in pure pandas/numpy (SURVEY.md §5.2-2).

The golden stand-in for the reference's ES 5.5 engine: identical
tokenization (engine.analysis.py_tokenize), identical math (k1=1.2, b=0.75,
exact doc lengths), deterministic tie-break by doc_id asc, scores rounded to
SCORE_DECIMALS — completely independent of Spark.

Supports the engine's documented multi-segment semantics: `stats_docs`
(which rows count toward N/avgdl/df — all stored docs, including superseded
ones, until a merge) may differ from `live_docs` (which rows may appear in
results).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from engine.analysis import py_tokenize
from engine.config import DEFAULT_CONFIG, SCORE_DECIMALS, IndexConfig


def bm25_topk_pandas(
    docs: pd.DataFrame,
    query_terms: list[str],
    k: int = 10,
    cfg: IndexConfig = DEFAULT_CONFIG,
    live_ids: set | None = None,
    conjunctive: bool = False,
) -> list[tuple[int, float]]:
    """docs: columns (doc_id, text). Returns [(doc_id, score)] top-k.

    All rows in `docs` count toward N/avgdl/df; only `live_ids` (default:
    all) are eligible for the result list.
    """
    terms = sorted(set(query_terms))
    toks = {int(r.doc_id): py_tokenize(r.text) for r in docs.itertuples()}
    n = len(toks)
    avgdl = (sum(len(t) for t in toks.values()) / n) if n else 0.0
    dfreq = {
        t: sum(1 for tk in toks.values() if t in set(tk)) for t in terms
    }
    scored = []
    for doc_id, tk in toks.items():
        if live_ids is not None and doc_id not in live_ids:
            continue
        cnt = Counter(tk)
        s, matched = 0.0, 0
        for t in terms:
            tf = cnt.get(t, 0)
            if tf == 0 or dfreq[t] == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf / (tf + cfg.k1 * (1 - cfg.b + cfg.b * len(tk) / avgdl))
        if matched == 0 or (conjunctive and matched < len(terms)):
            continue
        scored.append((doc_id, round(s, SCORE_DECIMALS)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]
