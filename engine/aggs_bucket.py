"""ES 5.5 bucket aggregations, part 2: top_hits, composite, range, filters.

Same implicit-layer rationale as engine/aggs.py — the reference posts whole
JSON `_source` docs to Elasticsearch
(/root/reference/src/main/java/org/elasticsearch/kafka/indexer/service/ElasticSearchBatchService.java:60)
and its consumers drive the ES search aggs API against them. This module
adds the four bucket families that round 5's first pass left out:

  - `top_hits`  -> top_hits_agg   (per-bucket top-K documents)
  - `composite` -> composite_agg  (key-ordered bucket pagination, after-key)
  - `range`     -> range_agg      (numeric [from, to) buckets, ES overlap
                                   semantics: a doc lands in EVERY matching
                                   range)
  - `filters`   -> filters_agg    (one named bucket per arbitrary predicate)

100 TB shape:
  - top_hits is the classic per-group top-k. Filtering `row_number() <= k`
    over a partitioned window lets Spark insert WindowGroupLimit, which
    takes the per-partition partial top-k BEFORE the shuffle — a hot bucket
    ships at most k rows per map partition, never its whole bucket. The
    bucket-selection side (top-N buckets by count) is a broadcast.
  - composite is ES's own answer to "terms agg over unbounded cardinality":
    instead of a global top-N it pages through the bucket space in key
    order. Each page is one hash-aggregate shuffle + a key-range filter
    that prunes everything <= after_key BEFORE aggregation (predicate on
    the grouping columns, pushed to the scan) + TakeOrdered(size). Pages
    are independent jobs, so the full bucket space streams without ever
    materializing it.
  - range / filters are single-pass map-side classifications: a broadcast
    of the (tiny, literal) range/filter list, conditional aggregation, one
    shuffle of (bucket, partial_count) rows. `filters` computes ALL named
    predicates in one scan (count_if columns, then an unpivot of the single
    aggregated row) — never one pass per filter.

Every function has a *_oracle_sql twin (DuckDB) for the driver value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.config import SCORE_DECIMALS


# ---------------------------------------------------------------------------
# top_hits aggregation (ES `terms` + `top_hits` sub-aggregation)
# ---------------------------------------------------------------------------


def top_hits_agg(
    df: DataFrame,
    bucket_field: str,
    sort_col: str,
    n_buckets: int = 5,
    n_hits: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `terms(bucket_field, size=n_buckets)` with a
    `top_hits(size=n_hits, sort=[sort_col desc])` sub-aggregation:
    for each of the top-`n_buckets` buckets by doc_count, the top-`n_hits`
    documents by `sort_col` (desc, id asc tie-break).

    Output: (key, doc_count, hit_rank, <id_col>, <sort_col>).

    Plan: bucket counts are one hash-aggregate + TakeOrdered(n_buckets),
    broadcast back onto the docs; the per-bucket top-k is a
    row_number window filtered to <= n_hits, which Spark rewrites with
    WindowGroupLimit (map-side partial top-k per bucket — the reason this
    survives a 10^9-doc hot bucket)."""
    top_buckets = (
        df.groupBy(F.col(bucket_field).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(n_buckets)
    )
    w = Window.partitionBy(bucket_field).orderBy(
        F.col(sort_col).desc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(top_buckets), df[bucket_field] == F.col("key"))
        .withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= n_hits)
        # long to match the oracle's BIGINT row_number (schema-hash parity)
        .select("key", "doc_count", F.col("hit_rank").cast("long").alias("hit_rank"),
                id_col, sort_col)
    )


def top_hits_oracle_sql(
    bucket_field: str,
    sort_col: str,
    n_buckets: int = 5,
    n_hits: int = 3,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    return f"""
WITH tb AS (
  SELECT {bucket_field} AS key, count(*) AS doc_count
  FROM {table} GROUP BY 1
  ORDER BY doc_count DESC, key ASC LIMIT {n_buckets}
), ranked AS (
  SELECT {bucket_field} AS key, {id_col}, {sort_col},
         row_number() OVER (
           PARTITION BY {bucket_field}
           ORDER BY {sort_col} DESC, {id_col} ASC) AS hit_rank
  FROM {table}
)
SELECT tb.key, tb.doc_count, r.hit_rank, r.{id_col}, r.{sort_col}
FROM ranked r JOIN tb ON r.key = tb.key
WHERE r.hit_rank <= {n_hits}
"""


# ---------------------------------------------------------------------------
# composite aggregation (ES `composite`: paged buckets in key order)
# ---------------------------------------------------------------------------


def composite_agg(
    df: DataFrame,
    sources: list[str],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """ES `composite` aggregation over `sources` (multi-source terms):
    buckets ordered by the key tuple ascending, first `size` buckets
    strictly AFTER `after` (the after_key of the previous page; None =
    first page). NULL keys sort first (ES missing-bucket-first order is
    not modeled; the fixtures are non-null).

    Plan: the after-key tuple comparison is a plain predicate on the
    grouping columns, so Catalyst pushes it to the scan — each page
    aggregates only the remaining key range, then one hash-aggregate and
    TakeOrdered(size). Paging the whole bucket space is O(pages) such
    jobs, never a global sort or a driver-side bucket list."""
    g = df.groupBy(*[F.col(s) for s in sources]).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    if after is not None:
        if len(after) != len(sources):
            raise ValueError("after key arity != sources arity")
        # (a, b) > (x, y)  <=>  a > x OR (a = x AND b > y), generalized.
        cond = F.lit(False)
        for i in range(len(sources) - 1, -1, -1):
            eq_prefix = F.lit(True)
            for j in range(i):
                eq_prefix = eq_prefix & (F.col(sources[j]) == F.lit(after[j]))
            cond = cond | (eq_prefix & (F.col(sources[i]) > F.lit(after[i])))
        g = g.filter(cond)
    return g.orderBy(*[F.col(s).asc() for s in sources]).limit(size)


def composite_oracle_sql(
    sources: list[str],
    size: int = 10,
    after: tuple | None = None,
    table: str = "documents",
) -> str:
    cols = ", ".join(sources)
    where = ""
    if after is not None:
        vals = ", ".join(
            f"'{v}'" if isinstance(v, str) else str(v) for v in after
        )
        where = f"WHERE ({cols}) > ({vals})"
    order = ", ".join(f"{s} ASC" for s in sources)
    return f"""
SELECT {cols}, count(*) AS doc_count
FROM {table} {where}
GROUP BY {cols}
ORDER BY {order}
LIMIT {size}
"""


# ---------------------------------------------------------------------------
# range aggregation (ES `range`: [from, to) buckets, overlap allowed)
# ---------------------------------------------------------------------------


def range_agg(
    df: DataFrame,
    field: str,
    ranges: list[tuple[str, float | None, float | None]],
    metric_col: str | None = None,
) -> DataFrame:
    """ES `range` aggregation: one bucket per (label, from, to) with ES
    semantics — from inclusive, to exclusive, either side open (None), and
    a document lands in EVERY range it matches (ranges may overlap, so
    this is NOT a single CASE classification). Optional avg sub-agg.

    Output: (key, doc_count[, avg_<metric>]) — one row per range, in the
    given order (range_idx drives the ordering, then dropped... kept as
    ES emits buckets in definition order; we emit key sorted by range
    index).

    Plan: the range list is a broadcast literal table; the join condition
    is non-equi but the build side is tiny (BroadcastNestedLoopJoin over
    <=10 literal rows — constant per-row work), then one hash-aggregate
    on the range key. Empty ranges still emit a zero row via a left join
    from the ranges literal."""
    rows = [
        (i, label, float(lo) if lo is not None else None,
         float(hi) if hi is not None else None)
        for i, (label, lo, hi) in enumerate(ranges)
    ]
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        rows, "range_idx int, key string, lo double, hi double"
    )
    cond = (
        (F.col("lo").isNull() | (F.col(field) >= F.col("lo")))
        & (F.col("hi").isNull() | (F.col(field) < F.col("hi")))
    )
    matched = df.join(F.broadcast(rdf), cond)
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if metric_col is not None:
        aggs.append(
            F.round(F.avg(metric_col), SCORE_DECIMALS).alias(f"avg_{metric_col}")
        )
    counted = matched.groupBy("range_idx", "key").agg(*aggs)
    # left join from the literal ranges so empty buckets emit doc_count=0
    out_cols = ["key", F.coalesce("doc_count", F.lit(0)).alias("doc_count")]
    if metric_col is not None:
        out_cols.append(F.col(f"avg_{metric_col}"))
    return (
        rdf.select("range_idx", "key")
        .join(counted.drop("key"), "range_idx", "left")
        .orderBy("range_idx")
        .select(*out_cols)
    )


def range_agg_oracle_sql(
    field: str,
    ranges: list[tuple[str, float | None, float | None]],
    metric_col: str | None = None,
    table: str = "documents",
) -> str:
    vals = ", ".join(
        f"({i}, '{label}', {('CAST(NULL AS DOUBLE)' if lo is None else float(lo))}, "
        f"{('CAST(NULL AS DOUBLE)' if hi is None else float(hi))})"
        for i, (label, lo, hi) in enumerate(ranges)
    )
    metric = (
        f", round(avg({metric_col}), {SCORE_DECIMALS}) AS avg_{metric_col}"
        if metric_col
        else ""
    )
    return f"""
WITH r(range_idx, key, lo, hi) AS (VALUES {vals}),
m AS (
  SELECT r.range_idx, r.key, count(t.{field}) AS doc_count{metric}
  FROM r LEFT JOIN {table} t
    ON (r.lo IS NULL OR t.{field} >= r.lo)
   AND (r.hi IS NULL OR t.{field} < r.hi)
  GROUP BY r.range_idx, r.key
)
SELECT key, doc_count{', avg_' + metric_col if metric_col else ''}
FROM m ORDER BY range_idx
"""


# ---------------------------------------------------------------------------
# filters aggregation (ES `filters`: one named bucket per predicate)
# ---------------------------------------------------------------------------


def filters_agg(df: DataFrame, named_filters: dict[str, F.Column]) -> DataFrame:
    """ES `filters` aggregation: one bucket per named predicate, each
    counting the docs matching it (buckets independent — a doc can match
    several). Output: (key, doc_count), keys in sorted order.

    Plan: ALL predicates evaluate in ONE scan — each is a conditional
    count column in a single global aggregate (map-side partial, one
    single-row shuffle), and the 1-row result unpivots to (key, count)
    rows with a literal stack. Adding a filter adds a column, not a
    pass."""
    names = sorted(named_filters)
    aggs = [
        F.sum(F.when(named_filters[n], 1).otherwise(0)).alias(n) for n in names
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in names)
    return one.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (key, doc_count)"
    ).orderBy("key")


def filters_oracle_sql(
    named_filter_sql: dict[str, str], table: str = "documents"
) -> str:
    parts = [
        f"SELECT '{n}' AS key, count(*) FILTER (WHERE {pred}) AS doc_count FROM {table}"
        for n, pred in sorted(named_filter_sql.items())
    ]
    return " UNION ALL ".join(parts) + " ORDER BY key"


# ---------------------------------------------------------------------------
# adjacency_matrix aggregation (ES `adjacency_matrix`)
# ---------------------------------------------------------------------------


def adjacency_matrix_agg(
    df: DataFrame, named_filters: dict[str, "F.Column"]
) -> DataFrame:
    """ES `adjacency_matrix`: doc counts for every named filter AND every
    pairwise intersection (key "a&b", names sorted — ES's key format).
    Empty intersections are omitted, matching ES.

    Plan: like `filters`, ONE scan — every singleton and pair is a
    conditional count column in a single global aggregate (k + k(k-1)/2
    columns; ES caps k at 100 for exactly this quadratic reason), then a
    literal unpivot. No join, no second pass."""
    names = sorted(named_filters)
    cols: list[tuple[str, "F.Column"]] = [(n, named_filters[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            cols.append((f"{a}&{b}", named_filters[a] & named_filters[b]))
    aggs = [
        F.sum(F.when(c, 1).otherwise(0)).alias(f"c{i}")
        for i, (_, c) in enumerate(cols)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `c{i}`" for i, (n, _) in enumerate(cols))
    return (
        one.selectExpr(f"stack({len(cols)}, {stack_args}) AS (key, doc_count)")
        .where(F.col("doc_count") > 0)
        .orderBy("key")
    )


def adjacency_matrix_oracle_sql(
    named_filter_sql: dict[str, str], table: str = "documents"
) -> str:
    names = sorted(named_filter_sql)
    rows = [(n, named_filter_sql[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            rows.append(
                (f"{a}&{b}",
                 f"({named_filter_sql[a]}) AND ({named_filter_sql[b]})")
            )
    parts = [
        f"SELECT '{n}' AS key, count(*) FILTER (WHERE {pred}) AS doc_count "
        f"FROM {table}"
        for n, pred in rows
    ]
    return ("SELECT key, doc_count FROM (" + " UNION ALL ".join(parts)
            + ") WHERE doc_count > 0 ORDER BY key")
