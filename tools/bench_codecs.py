"""Micro-bench: varint vs pfor on REAL posting streams (no Spark).

Builds the actual posting relation of an N-doc corpus driver-side (same
tokenizer, same (term, doc) sort and 128-posting blocks as the encoder),
then measures compressed size and encode/decode throughput of both block
codecs on the three value streams (per-block-restarted doc-id deltas,
tfs, dls). Prints one JSON line.

Usage: python tools/bench_codecs.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from engine.analysis import py_tokenize  # noqa: E402
from engine.codecs import (  # noqa: E402
    decode_posting_blocks_batch,
    pfor_pack_blocks,
    varint_encode_with_lengths,
)
from engine.corpus import webpages_pandas  # noqa: E402

BLOCK = 128


def posting_streams(n_docs: int):
    pdf = webpages_pandas(n_docs)
    terms, docs, tfs, dls = [], [], [], []
    for doc_id, text in enumerate(pdf["text"]):
        toks = py_tokenize(text)
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        terms.append(uniq)
        docs.append(np.full(len(uniq), doc_id, dtype=np.int64))
        tfs.append(counts.astype(np.int64))
        dls.append(np.full(len(uniq), len(toks), dtype=np.int64))
    term = np.concatenate(terms)
    doc = np.concatenate(docs)
    tf = np.concatenate(tfs)
    dl = np.concatenate(dls)
    order = np.lexsort((doc, term))
    term, doc, tf, dl = term[order], doc[order], tf[order], dl[order]
    # block boundaries: term change or 128-posting fill (mirrors the encoder)
    t_change = np.empty(len(term), dtype=bool)
    t_change[0] = True
    t_change[1:] = term[1:] != term[:-1]
    t_starts = np.flatnonzero(t_change)
    t_counts = np.diff(np.append(t_starts, len(term)))
    pos = np.arange(len(term)) - np.repeat(t_starts, t_counts)
    b_starts = np.flatnonzero((pos % BLOCK) == 0)
    b_ends = np.append(b_starts[1:], len(term))
    deltas = np.empty_like(doc)
    deltas[0] = doc[0]
    np.subtract(doc[1:], doc[:-1], out=deltas[1:])
    deltas[b_starts] = doc[b_starts]
    return deltas.astype(np.uint64), tf.astype(np.uint64), dl.astype(np.uint64), b_starts, b_ends


def bench_codec(name, deltas, tf, dl, b_starts, b_ends, reps=3):
    ns = (b_ends - b_starts).astype(np.int64)
    if name == "varint":
        def enc(v):
            buf, lens = varint_encode_with_lengths(v)
            off = np.concatenate(([0], np.cumsum(lens)))
            cuts = off[np.append(b_starts, len(v))]
            return buf, np.diff(cuts)
    else:
        def enc(v):
            return pfor_pack_blocks(v, b_starts, b_ends)

    t0 = time.perf_counter()
    for _ in range(reps):
        packs = [enc(v) for v in (deltas, tf, dl)]
    enc_s = (time.perf_counter() - t0) / reps
    bufs3 = []
    for buf, lens in packs:
        off = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        bufs3.append([bytes(buf[off[i]:off[i + 1]]) for i in range(len(ns))])
    t0 = time.perf_counter()
    for _ in range(reps):
        d, t, l = decode_posting_blocks_batch(*bufs3, ns, codec=name)
    dec_s = (time.perf_counter() - t0) / reps
    total_bytes = sum(len(buf) for buf, _ in packs)
    n_vals = 3 * len(deltas)
    return {
        "bytes": int(total_bytes),
        "bits_per_value": round(8 * total_bytes / n_vals, 2),
        "encode_mvals_s": round(n_vals / enc_s / 1e6, 1),
        "decode_mvals_s": round(n_vals / dec_s / 1e6, 1),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    deltas, tf, dl, b_starts, b_ends = posting_streams(n_docs)
    out = {
        "n_docs": n_docs,
        "n_postings": int(len(deltas)),
        "n_blocks": int(len(b_starts)),
    }
    for name in ("varint", "pfor"):
        out[name] = bench_codec(name, deltas, tf, dl, b_starts, b_ends)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
