"""Incremental-load watermarks: the reference's DynamoDB nested-map
state (ref: second_lambda_function.py:42-88 read/gate,
delta_load.py:204-265 advance) as a small parquet state table +
relational gate.

Semantics preserved exactly:
- per table, only a *strictly newer* version timestamp is processed
  (equal/older skipped — ref second_lambda_function.py:76);
- the watermark advances only after a successful load (ref
  delta_load.py:49-53), so failures replay (at-least-once), and the
  keyed upsert downstream makes the replay idempotent (exactly-once
  effect end-to-end).

The state table is tiny (one row per table name) — reading it is a
broadcast; the gate on arriving work is a broadcast left join + filter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA = "table_name string, folder_ts long"


class WatermarkStore:
    """Parquet-backed watermark state (`_ingest_watermarks`)."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    def read(self) -> DataFrame:
        if os.path.exists(self.state_dir):
            return self.spark.read.parquet(self.state_dir)
        return self.spark.createDataFrame([], schema=SCHEMA)

    def get(self, table_name: str) -> int | None:
        row = (
            self.read().filter(F.col("table_name") == table_name).select("folder_ts").first()
        )
        return row.folder_ts if row else None

    def advance(self, table_name: str, folder_ts: int) -> None:
        """Monotonic upsert of one table's watermark (never moves backward)."""
        current = self.get(table_name)
        if current is not None and current >= folder_ts:
            return
        from end_to_end_aws_data_pipeline_spark.ingest.merge import merge_into_parquet

        upd = self.spark.createDataFrame([(table_name, folder_ts)], schema=SCHEMA)
        merge_into_parquet(self.spark, self.state_dir, upd, keys=["table_name"])


def gate_strictly_newer(
    incoming: DataFrame,
    watermarks: DataFrame,
    key_col: str,
    ts_col: str,
    wm_key_col: str = "table_name",
    wm_ts_col: str = "folder_ts",
) -> DataFrame:
    """Keep incoming rows strictly newer than their key's watermark
    (rows with no watermark pass — first delivery).

    Batch-relational form of the reference's DynamoDB gate; the
    watermark side is small → broadcast join, zero shuffle of the
    incoming side.
    """
    wm = F.broadcast(
        watermarks.select(
            F.col(wm_key_col).alias("__wm_key"), F.col(wm_ts_col).alias("__wm_ts")
        )
    )
    return (
        incoming.join(wm, incoming[key_col] == wm["__wm_key"], "left")
        .filter(F.col("__wm_ts").isNull() | (F.col(ts_col) > F.col("__wm_ts")))
        .drop("__wm_key", "__wm_ts")
    )
