"""Join-strategy hints (SURVEY.md §2.B joins: physical strategies) and
streaming dedup after watermark (§2.B streaming rows)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.plans.explain import physical_plan
from tests.conftest import SF_SMOKE


def _join(spark, hint: str):
    c = table(spark, SF_SMOKE, "customer")
    o = table(spark, SF_SMOKE, "orders")
    return o.join(c.hint(hint), o.o_custkey == c.c_custkey)


def test_join_hints_select_physical_strategy(spark):
    assert "BroadcastHashJoin" in physical_plan(_join(spark, "broadcast"))
    assert "SortMergeJoin" in physical_plan(_join(spark, "merge"))
    assert "ShuffledHashJoin" in physical_plan(_join(spark, "shuffle_hash"))


def test_streaming_dedup_after_watermark(spark, tmp_path):
    """dropDuplicates on a keyed stream: re-delivered ids within the
    watermark are emitted exactly once (ref SQS dedup-id semantics,
    second_lambda_function.py:123, without the queue)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "b1.csv"), "w") as f:
        f.write("id,ts,v\n1,2024-01-01 10:00:00,a\n2,2024-01-01 10:01:00,b\n")
    q = (
        spark.readStream.schema("id long, ts timestamp, v string")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["id"])
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    # second delivery replays id=1 (same and different payload) + new id=3
    with open(os.path.join(src, "b2.csv"), "w") as f:
        f.write("id,ts,v\n1,2024-01-01 10:00:00,a\n1,2024-01-01 10:02:00,A\n3,2024-01-01 10:03:00,c\n")
    q.processAllAvailable()
    q.stop()
    rows = sorted((r.id, r.v) for r in spark.table("dedup_sink").collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]  # id=1 exactly once
