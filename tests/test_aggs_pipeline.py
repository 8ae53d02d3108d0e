"""ES pipeline aggregations (engine/aggs_pipeline.py) over a tiny
hand-checkable bucket relation."""

from __future__ import annotations

from pyspark.sql import Row

from engine.aggs_pipeline import (
    bucket_select_sort,
    bucket_siblings,
    pipeline_metrics,
)


def _hist(spark):
    rows = [
        Row(bucket="2024-01-01", doc_count=2, sum_value=10.0),
        Row(bucket="2024-01-02", doc_count=4, sum_value=30.0),
        Row(bucket="2024-01-03", doc_count=1, sum_value=5.0),
        Row(bucket="2024-01-04", doc_count=5, sum_value=30.0),
    ]
    return spark.createDataFrame(rows)


def test_pipeline_metrics_values(spark):
    out = {r.bucket: r for r in pipeline_metrics(_hist(spark), "sum_value",
                                                 moving_window=2,
                                                 serial_lag=2).collect()}
    assert out["2024-01-01"].derivative is None
    assert out["2024-01-02"].derivative == 20.0
    assert out["2024-01-03"].derivative == -25.0
    assert [out[b].cumulative for b in sorted(out)] == [10.0, 40.0, 45.0, 75.0]
    # moving avg window=2: trailing pair including current
    assert out["2024-01-01"].moving_avg == 10.0
    assert out["2024-01-03"].moving_avg == 17.5
    assert out["2024-01-03"].serial_diff == -5.0
    assert out["2024-01-04"].per_doc == 6.0


def test_bucket_siblings_argmax_tiebreak(spark):
    r = bucket_siblings(_hist(spark), "sum_value").collect()[0]
    assert r.n_buckets == 4
    assert r.avg_bucket == 18.75
    assert r.min_bucket == 5.0 and r.max_bucket == 30.0
    assert r.sum_bucket == 75.0
    # two buckets tie at 30.0 -> first bucket key wins deterministically
    assert r.max_bucket_key == "2024-01-02"


def test_bucket_select_sort(spark):
    out = bucket_select_sort(_hist(spark), "sum_value",
                             min_doc_count=2, top_n=2).collect()
    # doc_count gate drops 01-03; top-2 by sum desc, bucket-key tie-break
    assert [r.bucket for r in out] == ["2024-01-02", "2024-01-04"]
