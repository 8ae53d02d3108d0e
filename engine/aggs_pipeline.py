"""ES pipeline aggregations over a bucketed parent aggregation.

The reference delegates all aggregations to Elasticsearch 5.5
(/root/reference/build.gradle:42); ES 5.5 ships the pipeline-agg family
(derivative, cumulative_sum, moving_avg, serial_diff, bucket_script,
bucket_selector, bucket_sort, and the sibling avg/max/min/sum/stats_bucket
aggs) computed over the buckets of a parent histogram. This module
re-expresses them as Spark window/aggregate plans over the engine's own
`date_histogram` output (engine/aggs.py).

100 TB shape: every function here consumes the PARENT AGG's output, whose
row count is bounded by the time span / interval (buckets), not by the
corpus. The unpartitioned `Window.orderBy("bucket")` is therefore bounded
by construction — e.g. ten years of daily buckets is 3,653 rows — and is
exactly how ES computes pipeline aggs (reduce-phase, single node, over the
already-reduced bucket list). The expensive part (one hash-aggregate
shuffle over the corpus) happens once in the parent; the pipeline pass adds
no corpus-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.config import SCORE_DECIMALS

# Buckets are a reduce-phase relation (bounded by time span); a single
# ordered window over them is the intended plan, not a scale risk.
def _w() -> Window:
    return Window.orderBy("bucket")


def pipeline_metrics(
    hist: DataFrame, metric: str, moving_window: int = 3, serial_lag: int = 2
) -> DataFrame:
    """Parent-sibling pipeline metrics per bucket, all in ONE window pass:

    - ``derivative``      — ES `derivative`: metric minus previous bucket's
      (null for the first bucket, ES semantics).
    - ``cumulative``      — ES `cumulative_sum`: running total.
    - ``moving_avg``      — ES `moving_fn`/`moving_avg` with window=N over
      the trailing N buckets INCLUDING the current one.
    - ``serial_diff``     — ES `serial_diff` with lag=n.
    - ``per_doc``         — ES `bucket_script`: metric / doc_count (a
      two-metric script, the canonical example in the ES docs).

    `hist` is a date_histogram output with columns
    (bucket, doc_count, <metric>).
    """
    m = F.col(metric)
    _W = _w()
    mw = _W.rowsBetween(-(moving_window - 1), 0)
    return hist.select(
        "bucket",
        "doc_count",
        m.alias(metric),
        F.round(m - F.lag(m, 1).over(_W), SCORE_DECIMALS).alias("derivative"),
        F.round(
            F.sum(m).over(_W.rowsBetween(Window.unboundedPreceding, 0)),
            SCORE_DECIMALS,
        ).alias("cumulative"),
        F.round(F.avg(m).over(mw), SCORE_DECIMALS).alias("moving_avg"),
        F.round(m - F.lag(m, serial_lag).over(_W), SCORE_DECIMALS).alias(
            "serial_diff"
        ),
        F.round(m / F.col("doc_count"), SCORE_DECIMALS).alias("per_doc"),
    ).orderBy("bucket")


def pipeline_metrics_oracle_sql(
    inner_sql: str, metric: str, moving_window: int = 3, serial_lag: int = 2
) -> str:
    """DuckDB twin of pipeline_metrics over the same parent-agg SQL."""
    return f"""
        WITH hist AS ({inner_sql})
        SELECT bucket, doc_count, {metric},
               round({metric} - lag({metric}, 1) OVER w, {SCORE_DECIMALS})
                 AS derivative,
               round(sum({metric}) OVER (ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     {SCORE_DECIMALS}) AS cumulative,
               round(avg({metric}) OVER (ORDER BY bucket
                     ROWS BETWEEN {moving_window - 1} PRECEDING AND CURRENT ROW),
                     {SCORE_DECIMALS}) AS moving_avg,
               round({metric} - lag({metric}, {serial_lag}) OVER w,
                     {SCORE_DECIMALS}) AS serial_diff,
               round({metric} / doc_count, {SCORE_DECIMALS}) AS per_doc
        FROM hist
        WINDOW w AS (ORDER BY bucket)
        ORDER BY bucket
    """


def bucket_siblings(hist: DataFrame, metric: str) -> DataFrame:
    """ES sibling pipeline aggs in one row: avg_bucket / max_bucket /
    min_bucket / sum_bucket / stats_bucket over the parent's buckets, plus
    the bucket KEY holding the max (ES max_bucket returns `keys` — we emit
    the first key in bucket order on ties, deterministic).

    Plan: the parent's bucket relation is reduce-phase-sized; one aggregate
    plus one min-by struct comparison — no second corpus scan.
    """
    m = F.col(metric)
    return hist.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.avg(m), SCORE_DECIMALS).alias("avg_bucket"),
        F.round(F.min(m), SCORE_DECIMALS).alias("min_bucket"),
        F.round(F.max(m), SCORE_DECIMALS).alias("max_bucket"),
        F.round(F.sum(m), SCORE_DECIMALS).alias("sum_bucket"),
        # arg-max with deterministic tie-break: lexicographic struct min on
        # (-metric, bucket) == first bucket key among the max-metric buckets
        F.min(F.struct((-m).alias("neg"), F.col("bucket"))).getField("bucket")
        .alias("max_bucket_key"),
    )


def bucket_siblings_oracle_sql(inner_sql: str, metric: str) -> str:
    return f"""
        WITH hist AS ({inner_sql})
        SELECT count(*) AS n_buckets,
               round(avg({metric}), {SCORE_DECIMALS}) AS avg_bucket,
               round(min({metric}), {SCORE_DECIMALS}) AS min_bucket,
               round(max({metric}), {SCORE_DECIMALS}) AS max_bucket,
               round(sum({metric}), {SCORE_DECIMALS}) AS sum_bucket,
               (SELECT bucket FROM hist
                ORDER BY {metric} DESC, bucket ASC LIMIT 1) AS max_bucket_key
        FROM hist
    """


def bucket_select_sort(
    hist: DataFrame, metric: str, min_doc_count: int, top_n: int
) -> DataFrame:
    """ES `bucket_selector` (keep buckets whose doc_count passes the
    predicate) followed by `bucket_sort` (order by the metric desc, truncate
    to top_n). Ties break by bucket key ascending — deterministic in both
    engines.

    Plan: filter + TakeOrderedAndProject over the reduce-phase bucket
    relation; bounded rows, no corpus shuffle.
    """
    return (
        hist.where(F.col("doc_count") >= min_doc_count)
        .orderBy(F.col(metric).desc(), F.col("bucket").asc())
        .limit(top_n)
    )


def bucket_select_sort_oracle_sql(
    inner_sql: str, metric: str, min_doc_count: int, top_n: int
) -> str:
    return f"""
        WITH hist AS ({inner_sql})
        SELECT * FROM hist
        WHERE doc_count >= {min_doc_count}
        ORDER BY {metric} DESC, bucket ASC
        LIMIT {top_n}
    """
