"""Tokenizer contract: the regex `[\\p{L}\\p{N}]+` + lowercase IS the
frozen analysis contract, shared verbatim by the Spark engine and the
DuckDB oracle (engine/analysis.py:40). It APPROXIMATES the reference's
ES 5.5 `standard` analyzer (UAX#29 word segmentation + lowercase,
anchor /root/reference/build.gradle:42) but diverges on known classes of
input — documented and pinned here (VERDICT r04 "What's missing" #4).

Divergences from true UAX#29 (each case below asserts the engine's ACTUAL
behavior, so any accidental change to the contract fails loudly):

- apostrophes: UAX#29 MidLetter keeps "don't" as one word; we split.
- numeric separators: UAX#29 MidNum keeps "3.14" / "1,000" whole; we split.
- ExtendNumLet: UAX#29 keeps "foo_bar" together (underscore); we split.
- combining marks: \\p{Mn} is not \\p{L}, so a DECOMPOSED "café"
  (e + U+0301) tokenizes as "cafe" - the mark is dropped; UAX#29 keeps the
  grapheme. Precomposed "café" (U+00E9) is unaffected.
- CJK: UAX#29 emits one token per Han ideograph; we emit the maximal
  letter run (no dictionary segmentation either way).

What does NOT diverge: both engines (Java regex and RE2) implement
\\p{L}/\\p{N} identically, so Spark and the oracle produce byte-identical
token streams for ANY input — the invariant every driver value-hash rests
on. Divergence from ES is a fidelity bound vs the reference, not an
internal inconsistency.
"""

from __future__ import annotations

import duckdb

from engine.analysis import tokens
from engine.config import TOKEN_PATTERN

CASES = {
    "don't": ["don", "t"],
    "3.14 1,000": ["3", "14", "1", "000"],
    "foo_bar": ["foo", "bar"],
    "caf\u00e9": ["caf\u00e9"],               # precomposed \u00e9: kept whole
    "cafe\u0301": ["cafe"],                    # decomposed e+U+0301: mark dropped
    "naïve a-b": ["naïve", "a", "b"],
    "日本語のテスト": [
        "日本語のテスト"
    ],                                      # CJK: one maximal run
    "Ψυχή мир": [
        "ψυχή", "мир"
    ],                                      # Greek/Cyrillic lowercase
}


def test_tokenizer_pinned_behavior(spark):
    df = spark.createDataFrame(
        [(c,) for c in CASES], "text string"
    ).select("text", tokens("text").alias("t"))
    got = {r["text"]: list(r["t"]) for r in df.collect()}
    assert got == CASES


def test_tokenizer_oracle_identical():
    """The oracle side of the frozen contract: DuckDB's RE2 must produce the
    same token stream for every pinned case."""
    con = duckdb.connect()
    for text, want in CASES.items():
        got = con.execute(
            f"select regexp_extract_all(lower(?), '{TOKEN_PATTERN}')", [text]
        ).fetchone()[0]
        assert got == want, text
