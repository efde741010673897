"""Accuracy contracts for the sketch-based aggregates (no DuckDB oracle
possible — sketches are engine-specific), asserted against their exact
twins on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= 0.15 * row.exact


def test_percentile_approx_close_to_exact(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= 0.02 * row.exact
