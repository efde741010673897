"""The merge_asof (Arrow) path must agree with the pure-JVM window path."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.operators.asof import asof_join, asof_join_pandas
from tests.conftest import SF_SMOKE


def test_asof_pandas_equals_window_path(spark):
    e = table(spark, SF_SMOKE, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("value").alias("click_value"))
    )
    kwargs = dict(
        on="user_id", left_ts="ts", right_ts="click_ts",
        value_cols=["click_ts", "click_value"],
    )
    window_path = {
        (r.event_id, r.click_ts, r.click_value)
        for r in asof_join(purchases, clicks, **kwargs).collect()
    }
    pandas_path = {
        (r.event_id, r.click_ts, r.click_value)
        for r in asof_join_pandas(purchases, clicks, **kwargs).collect()
    }
    assert window_path == pandas_path
    assert len(window_path) == purchases.count()
