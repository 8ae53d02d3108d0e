"""Posting-block codecs: delta + varint (LEB128), fully numpy-vectorized.

Re-implements, from scratch, the compressed posting-list representation the
reference gets for free from Lucene inside Elasticsearch 5.5
(/root/reference/build.gradle:42): per-term postings sorted by docID,
delta-encoded, varint-compressed, in fixed-size blocks with block-max
metadata (Lucene block postings / impacts). No per-element Python loops:
encode/decode are O(max_varint_len)=10 vectorized numpy passes, Arrow-friendly
for use inside pandas UDFs (BASELINE.json: "no per-row Python").
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array -> bytes."""
    return varint_encode_with_lengths(values)[0]


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array -> (bytes, per-element byte lengths).

    The lengths array lets a caller slice the single encoded buffer into
    arbitrary contiguous sub-ranges (e.g. per posting block) without
    re-encoding — the whole-flush single-pass encode path."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = 1 + (v[:, None] >= _THRESHOLDS[None, :]).sum(axis=1).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for b in range(10):
        mask = nbytes > b
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > b + 1).astype(np.uint8) << 7
        out[starts[mask] + b] = byte | cont
    return out.tobytes(), nbytes


def varint_decode(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array."""
    if not data:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    is_end = (raw & 0x80) == 0
    # value index of each byte: 0-based running count of terminators before it
    val_idx = np.concatenate(([0], np.cumsum(is_end)[:-1]))
    n_vals = int(is_end.sum())
    starts = np.concatenate(([0], np.nonzero(is_end)[0][:-1] + 1))
    pos = np.arange(len(raw)) - starts[val_idx]
    vals = np.zeros(n_vals, dtype=np.uint64)
    np.bitwise_or.at(
        vals, val_idx, (raw & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    )
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids -> [first, gaps...] as uint64."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(a.size, dtype=np.uint64)
    out[0] = np.uint64(a[0])
    if a.size > 1:
        gaps = np.diff(a)
        if (gaps <= 0).any():
            raise ValueError("doc ids must be strictly increasing")
        out[1:] = gaps.astype(np.uint64)
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode -> int64 ids."""
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(deltas.astype(np.int64))


def encode_posting_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(docs_bytes, tfs_bytes) for one block (doc_ids strictly increasing)."""
    return varint_encode(delta_encode(doc_ids)), varint_encode(
        np.asarray(tfs, dtype=np.uint64)
    )


def decode_posting_block(docs_bytes: bytes, tfs_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_posting_block -> (int64 doc_ids, int64 tfs)."""
    return delta_decode(varint_decode(docs_bytes)), varint_decode(tfs_bytes).astype(
        np.int64
    )


def decode_posting_blocks_batch(
    doc_bufs, tf_bufs, dl_bufs, ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY posting blocks in one vectorized pass.

    Varint is self-delimiting, so the per-block buffers concatenate into one
    stream that decodes to the concatenated values; `ns` (postings per block)
    then segments the flat arrays. Doc ids come from a segmented cumsum over
    the per-block-restarted deltas: global cumsum minus the cumsum value at
    each block's start (the block's first delta is the absolute first doc id,
    mirroring `_encode_term_major`). Replaces a per-block Python loop with
    ~6 numpy passes over the whole batch — the decode half of the encoder's
    `varint_encode_with_lengths` single-buffer design.

    Returns (doc_ids int64, tfs int64, dls int64), each of length ns.sum().
    """
    ns = np.ascontiguousarray(ns, dtype=np.int64)
    total = int(ns.sum())
    deltas = varint_decode(b"".join(doc_bufs)).astype(np.int64)
    tfs = varint_decode(b"".join(tf_bufs)).astype(np.int64)
    dls = varint_decode(b"".join(dl_bufs)).astype(np.int64)
    if not (len(deltas) == len(tfs) == len(dls) == total):
        raise ValueError(
            f"posting block corruption: n says {total} postings, decoded "
            f"{len(deltas)}/{len(tfs)}/{len(dls)}"
        )
    if total == 0:
        return deltas, tfs, dls
    csum = np.cumsum(deltas)
    starts = np.empty(len(ns), dtype=np.int64)
    starts[0] = 0
    np.cumsum(ns[:-1], out=starts[1:])
    prev = np.zeros(len(ns), dtype=np.int64)
    prev[1:] = csum[starts[1:] - 1]
    docs = csum - np.repeat(prev, ns)
    return docs, tfs, dls
