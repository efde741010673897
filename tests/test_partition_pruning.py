"""Partition pruning — static and dynamic — on partitioned parquet
(SURVEY.md §4.2: free from Catalyst *once storage is partitioned*; this
is the evidence that our layout choices actually engage it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.plans.explain import formatted_plan
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_by_type(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "events_by_type")
    table(spark, SF_SMOKE, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(out)
    return out


def test_static_partition_pruning(spark, events_by_type):
    df = spark.read.parquet(events_by_type).filter(F.col("event_type") == "click")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].splitlines()[0]
    # and the result is right: only click rows, from ~1/5 of the files
    n_click = df.count()
    n_all = spark.read.parquet(events_by_type).count()
    assert 0 < n_click < n_all


def test_dynamic_partition_pruning(spark, events_by_type):
    """A filter on the joined dim prunes fact partitions at runtime
    (the DPP subquery shows up in the fact scan's partition filters)."""
    fact = spark.read.parquet(events_by_type)
    dim = spark.createDataFrame(
        [("click", "interaction"), ("view", "interaction"), ("error", "problem")],
        "event_type string, category string",
    )
    joined = fact.join(dim, "event_type").filter(F.col("category") == "problem")
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower()
    # semantics: only 'error' rows survive
    assert joined.select("event_type").distinct().collect() == [("error",)] or [
        r.event_type for r in joined.select("event_type").distinct().collect()
    ] == ["error"]
