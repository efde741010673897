"""Source-format operators: CSV / JSON(L) scans through the correctness
gate, proving format round-trips preserve values (SURVEY.md §2.B
scans/sources rows; generalizes the reference's CSV-only ingestion,
ref delta_load.py:62-66).

Each query materializes a deterministic derived file (once per sf_dir,
cached by content-independent path) from the canonical parquet, scans
it back through the format under test, and aggregates — the oracle
computes the same aggregate straight from parquet, so any loss or
mangling in the write→scan round-trip breaks the hash match.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.functions.aggs import dsum, dsum_sql
from end_to_end_aws_data_pipeline_spark.registry import register


def _derived_dir(sf_dir: str, fmt: str) -> str:
    tag = hashlib.sha1(f"{os.path.abspath(sf_dir)}:{fmt}".encode()).hexdigest()[:12]
    return os.path.join("/tmp", f"derived_src_{tag}")


def _ensure_nation_csv(spark: SparkSession, sf_dir: str) -> str:
    out = _derived_dir(sf_dir, "csv")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option(
            "header", True
        ).csv(out)
    return out


def _ensure_orders_jsonl(spark: SparkSession, sf_dir: str) -> str:
    out = _derived_dir(sf_dir, "json")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        # project to types JSON round-trips exactly (longs + strings)
        table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            # NTZ → LTZ (session is UTC) → epoch seconds
            F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
        ).coalesce(2).write.mode("overwrite").json(out)
    return out


_CSV_ORACLE = """
SELECT n_regionkey, count(*) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation
GROUP BY n_regionkey
"""


@register("q_source_csv_scan", oracle=_CSV_ORACLE)
def q_source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → CSV(header) → schema'd distributed scan → aggregate;
    value-level equality with the parquet original is the check."""
    path = _ensure_nation_csv(spark, sf_dir)
    df = (
        spark.read.option("header", True)
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .csv(path)
    )
    return df.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
    )


_JSON_ORACLE = f"""
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(max(epoch(o_orderdate)) AS BIGINT) AS max_epoch
FROM orders
GROUP BY o_orderstatus
"""


@register("q_source_json_scan", oracle=_JSON_ORACLE)
def q_source_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → JSONL → schema'd scan → aggregate (schema-on-read, no
    inference pass — the production posture for JSON at scale)."""
    path = _ensure_orders_jsonl(spark, sf_dir)
    df = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, order_epoch long"
    ).json(path)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").cast("long").alias("key_checksum"),
        F.max("order_epoch").alias("max_epoch"),
    )
