"""Inverted-index construction: posting lists as compressed block rows.

Re-implements what the reference delegates to Lucene inside ES 5.5 (D3/D4 in
SURVEY.md §2.5; anchor /root/reference/build.gradle:42): per-term posting
lists of (docID, tf), sorted by docID, delta+varint-compressed into
fixed-size blocks with block-max metadata (Lucene block postings/impacts).

Plan shape (scale-first):
  tokens = explode(tokenize(text))                       # narrow
  tf     = groupBy(doc_id, term).count                   # shuffle 1 (by doc+term; partial agg map-side)
  tf+dl  = join doc_lengths on doc_id                    # co-keyed with shuffle 1
  df     = groupBy(term).count                           # tiny after partial agg
  blocks = groupBy(term, bucket).applyInPandas(encode)   # shuffle 2 (by term)

Hot-term skew (Zipfian "the"-like terms hit ~every doc) is defused by
RANGE-bucketing, not hash-salting: bucket = floor(doc_id * S_t / n_docs)
with S_t sized from df(t), so each (term, bucket) group is a bounded,
CONTIGUOUS doc_id range. Contiguity means per-bucket encoded blocks
concatenate into the term's globally doc_id-sorted posting list without a
second merge pass — the re-sort a hash salt would force (SURVEY.md §4.2).
Rare terms get S_t = 1 (no block fragmentation).

Block-max metadata stores (max_tf, min_dl) impacts rather than a frozen
score: BM25 upper bounds are recomputed from CURRENT global stats at query
time (score rises in tf, falls in dl), so merges/new segments never
invalidate stored metadata — same reason Lucene stores impacts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.analysis import tokens
from engine.codecs import decode_posting_block, encode_posting_block, varint_decode, varint_encode
from engine.config import DEFAULT_CONFIG, IndexConfig

POSTINGS_SCHEMA = (
    "term string, n int, min_doc long, max_doc long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, max_tf int, min_dl int"
)

# Max postings per (term, bucket) group — bounds applyInPandas group memory.
# 1M postings ~ 8-16 MB in-flight per group; at 10^12 docs a df=9e11 hot term
# fans out to ~900k parallel groups instead of one 9e11-row reducer.
DEFAULT_BUCKET_POSTINGS = 1 << 20


def term_freq_with_doclen(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, dl): posting relation joined with doc lengths.

    tf and dl are derived in ONE tokenize pass: dl = sum(tf) over the doc's
    terms (token count == sum of term frequencies), so no second corpus scan.
    The window adds one doc_id-keyed exchange, but over the already-aggregated
    tf relation — much smaller than re-scanning + re-exploding raw text.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    return tf.withColumn("dl", F.sum("tf").over(w).cast("long"))


def build_posting_blocks(
    tf_dl: DataFrame,
    n_docs: int,
    cfg: IndexConfig = DEFAULT_CONFIG,
    bucket_postings: int = DEFAULT_BUCKET_POSTINGS,
) -> DataFrame:
    """(doc_id, term, tf, dl) -> compressed block rows (POSTINGS_SCHEMA)."""
    dfreq = tf_dl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_buckets = F.greatest(
        F.lit(1), F.ceil(F.col("df") / F.lit(bucket_postings))
    ).cast("long")
    with_bucket = (
        tf_dl.join(dfreq.select("term", n_buckets.alias("s_t")), "term")
        .withColumn(
            "bucket",
            # double math: long*long would overflow at 10^12-doc scale; the
            # float rounding only nudges bucket boundaries, ranges stay
            # contiguous (monotone in doc_id), which is all we need
            F.least(
                F.col("s_t") - 1,
                F.floor(
                    F.col("doc_id").cast("double")
                    * F.col("s_t").cast("double")
                    / F.lit(float(max(n_docs, 1)))
                ).cast("long"),
            ),
        )
    )

    block_size = cfg.block_size

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        docs = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        term = pdf["term"].iloc[0]
        rows = []
        for s in range(0, len(docs), block_size):
            e = min(s + block_size, len(docs))
            db, tb = encode_posting_block(docs[s:e], tfs[s:e])
            # dl travels with the block (Lucene norms analog): scoring and
            # WAND never need a doc-table join
            lb = varint_encode(dls[s:e].astype(np.uint64))
            rows.append(
                (
                    term,
                    e - s,
                    int(docs[s]),
                    int(docs[e - 1]),
                    db,
                    tb,
                    lb,
                    int(tfs[s:e].max()),
                    int(dls[s:e].min()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "n", "min_doc", "max_doc",
                "doc_bytes", "tf_bytes", "dl_bytes", "max_tf", "min_dl",
            ],
        )

    return with_bucket.groupBy("term", "bucket").applyInPandas(
        encode, schema=POSTINGS_SCHEMA
    )


def build_posting_blocks_local(
    docs: DataFrame,
    cfg: IndexConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    assume_partitioned: bool = False,
    flush_docs: int = 25_000,
) -> DataFrame:
    """Shuffle-free posting build: the production path for the ingest loop.

    Key insight: term frequency is a PER-DOCUMENT computation — a doc's
    tokens all live in its own row, so tf needs no explode and no
    groupBy(doc_id, term) shuffle at all. Each doc-id-range partition
    tokenizes, counts and block-encodes its own docs in one Arrow pass
    (py_tokenize == the JVM tokenizer, tested); only the compressed block
    rows (~2 orders of magnitude smaller than the raw token stream) ever
    hit a shuffle (the term-sorted segment write).

    vs the relational path (build_posting_blocks): identical decoded
    postings (tested), but none of its three 10^|tokens|-row shuffles.
    Hot-term skew is structurally absent here: a hot term's postings are
    built independently in every doc-range partition (the doc-range
    bucketing IS the salt); blocks stay contiguous per partition, which is
    all block-max WAND needs (blocks are range-pruned by min_doc/max_doc,
    global contiguity is not required).

    `flush_docs` bounds builder memory per partition (postings for at most
    that many docs are buffered before encoding) — the knob that keeps a
    1M-doc partition from holding 300M postings in Python at 10^12-doc
    scale."""
    from engine.analysis import py_tokenize

    sel = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    if not assume_partitioned:
        n = num_partitions or sel.sparkSession.sparkContext.defaultParallelism
        sel = sel.repartitionByRange(n, "doc_id")
    sel = sel.sortWithinPartitions("doc_id")

    block_size = cfg.block_size
    cols = [
        "term", "n", "min_doc", "max_doc",
        "doc_bytes", "tf_bytes", "dl_bytes", "max_tf", "min_dl",
    ]

    def flush(doc_ids: list, texts: list) -> pd.DataFrame:
        terms_l, docs_l, tfs_l, dls_l = [], [], [], []
        for did, text in zip(doc_ids, texts):
            toks = py_tokenize(text)
            if not toks:
                continue
            terms, tfs = np.unique(toks, return_counts=True)
            terms_l.append(terms)
            docs_l.append(np.full(len(terms), did, dtype=np.int64))
            tfs_l.append(tfs.astype(np.int64))
            dls_l.append(np.full(len(terms), len(toks), dtype=np.int64))
        if not terms_l:
            return pd.DataFrame(columns=cols)
        pdf = pd.DataFrame(
            {
                "term": np.concatenate(terms_l),
                "doc_id": np.concatenate(docs_l),
                "tf": np.concatenate(tfs_l),
                "dl": np.concatenate(dls_l),
            }
        )
        rows = []
        # rows are appended in doc_id order, pandas groupby(sort=False)
        # preserves in-group order -> per-term doc_ids are ascending
        for term, g in pdf.groupby("term", sort=False):
            d = g["doc_id"].to_numpy()
            t = g["tf"].to_numpy()
            l_ = g["dl"].to_numpy()
            for s in range(0, len(d), block_size):
                e = min(s + block_size, len(d))
                db, tb = encode_posting_block(d[s:e], t[s:e])
                lb = varint_encode(l_[s:e].astype(np.uint64))
                rows.append(
                    (term, e - s, int(d[s]), int(d[e - 1]), db, tb, lb,
                     int(t[s:e].max()), int(l_[s:e].min()))
                )
        return pd.DataFrame(rows, columns=cols)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf_ids: list = []
        buf_texts: list = []
        for b in batches:
            buf_ids.extend(b["doc_id"].tolist())
            buf_texts.extend(b["text"].tolist())
            if len(buf_ids) >= flush_docs:
                yield flush(buf_ids, buf_texts)
                buf_ids, buf_texts = [], []
        if buf_ids:
            yield flush(buf_ids, buf_texts)

    return sel.mapInPandas(enc, schema=POSTINGS_SCHEMA)


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df) from block rows — the query planner's tiny side table."""
    return postings.groupBy("term").agg(F.sum("n").cast("long").alias("df"))


def decode_postings(postings: DataFrame) -> DataFrame:
    """Block rows -> long form (term, doc_id, tf, dl); vectorized decode."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            terms, docs, tfs, dls = [], [], [], []
            for t, db, tb, lb in zip(
                b["term"], b["doc_bytes"], b["tf_bytes"], b["dl_bytes"]
            ):
                d, f_ = decode_posting_block(bytes(db), bytes(tb))
                docs.append(d)
                tfs.append(f_)
                dls.append(varint_decode(bytes(lb)).astype(np.int64))
                terms.append(np.full(len(d), t, dtype=object))
            if not terms:
                yield pd.DataFrame({"term": [], "doc_id": [], "tf": [], "dl": []})
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs),
                    "tf": np.concatenate(tfs),
                    "dl": np.concatenate(dls),
                }
            )

    return postings.mapInPandas(
        dec, schema="term string, doc_id long, tf long, dl long"
    )
