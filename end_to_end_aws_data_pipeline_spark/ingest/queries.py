"""Oracle-checkable queries for the ETL-parity operators (SURVEY.md
§2.A rows 3-5, 8, 10-11), expressed over the canonical tables.

The canonical testdata has no nulls/duplicates, so each query first
*derives* a deterministic dirty view (CASE-nulling, projection to
low-cardinality columns) identically on both engines, then applies the
engine operator vs its relational definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.ingest.clean import clean
from end_to_end_aws_data_pipeline_spark.ingest.merge import upsert
from end_to_end_aws_data_pipeline_spark.ingest.watermark import gate_strictly_newer
from end_to_end_aws_data_pipeline_spark.registry import register


def _dirty_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dirty view: null value on errors, null type for
    user_id % 7 == 0, value bucketized so exact duplicates exist."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "user_id",
        F.when(F.col("user_id") % 7 != 0, F.col("event_type")).alias("etype"),
        F.when(F.col("event_type") != "error", F.round(F.col("value"), 0)).alias(
            "value_bucket"
        ),
    )


_DIRTY_SQL = """
  SELECT
    user_id,
    CASE WHEN user_id % 7 <> 0 THEN event_type END AS etype,
    CASE WHEN event_type <> 'error' THEN round(value, 0) END AS value_bucket
  FROM events
"""

_CLEAN_ORACLE = f"""
WITH dirty AS ({_DIRTY_SQL})
SELECT DISTINCT user_id, etype, value_bucket
FROM dirty
WHERE user_id IS NOT NULL AND etype IS NOT NULL AND value_bucket IS NOT NULL
"""


@register("q_etl_clean", oracle=_CLEAN_ORACLE)
def q_etl_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean() = dropna(any) + full-row dedup ≡ WHERE no-null + DISTINCT
    (ref delta_load.py:97-98)."""
    return clean(_dirty_events(spark, sf_dir))


_AUDIT_ORACLE = f"""
WITH dirty AS ({_DIRTY_SQL})
SELECT
  count(*) AS n_rows,
  CAST(count(*) FILTER (WHERE user_id IS NULL OR etype IS NULL
                           OR value_bucket IS NULL) AS BIGINT) AS n_bad_rows,
  CAST(count(*) FILTER (WHERE etype IS NULL) AS BIGINT) AS null_etype,
  CAST(count(*) FILTER (WHERE value_bucket IS NULL) AS BIGINT) AS null_value_bucket
FROM dirty
"""


@register("q_etl_null_audit", oracle=_AUDIT_ORACLE)
def q_etl_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized null audit: one aggregation pass replaces the
    reference's per-row isnull loop + per-row SNS publish
    (ref delta_load.py:67-84)."""
    d = _dirty_events(spark, sf_dir)
    any_null = (
        F.col("user_id").isNull() | F.col("etype").isNull() | F.col("value_bucket").isNull()
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(any_null.cast("long")).alias("n_bad_rows"),
        F.sum(F.col("etype").isNull().cast("long")).alias("null_etype"),
        F.sum(F.col("value_bucket").isNull().cast("long")).alias("null_value_bucket"),
    )


_UPSERT_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice AS price
  FROM orders WHERE o_orderkey % 3 <> 0
), upd AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS price
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT
  coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
  coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
  coalesce(u.price, b.price) AS price
FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
"""


@register("q_etl_upsert_merge", oracle=_UPSERT_ORACLE)
def q_etl_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert (MERGE semantics): updates replace matching keys,
    new keys append — the set-based form of the reference's row-by-row
    ON DUPLICATE KEY UPDATE (ref delta_load.py:182-186). Relationally
    ≡ FULL OUTER JOIN + COALESCE, which the oracle states."""
    o = table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("price")
    )
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("price"),
    )
    return upsert(base, updates, keys=["o_orderkey"])


_GATE_ORACLE = """
WITH wm AS (
  SELECT o_custkey AS table_key, max(o_orderdate) AS folder_ts
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
  GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_orderdate
FROM orders o LEFT JOIN wm ON o.o_custkey = wm.table_key
WHERE wm.folder_ts IS NULL OR o.o_orderdate > wm.folder_ts
"""


@register("q_etl_incremental_gate", oracle=_GATE_ORACLE)
def q_etl_incremental_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-newer incremental gate (ref second_lambda_function.py:
    76-88): per-key watermark built from 'already loaded' deliveries;
    only strictly newer arrivals pass, unknown keys pass."""
    o = table(spark, sf_dir, "orders")
    wm = (
        o.filter(F.col("o_orderdate") < F.to_timestamp(F.lit("1995-07-01 00:00:00")))
        .groupBy(F.col("o_custkey").alias("table_key"))
        .agg(F.max("o_orderdate").alias("folder_ts"))
    )
    gated = gate_strictly_newer(
        o, wm, key_col="o_custkey", ts_col="o_orderdate",
        wm_key_col="table_key", wm_ts_col="folder_ts",
    )
    return gated.select("o_orderkey", "o_custkey", "o_orderdate")


_INFER_ORACLE = """
SELECT * FROM (VALUES
  ('TeacherId',    'INTEGER'),
  ('TeacherName',  'VARCHAR(255)'),
  ('DateOfJoining','VARCHAR(255)'),
  ('Salary',       'FLOAT'),
  ('LeadingZero',  'INTEGER'),
  ('NegativeInt',  'FLOAT'),
  ('EmptyFirst',   'VARCHAR(255)')
) AS t(column_name, data_type)
"""


@register("q_etl_schema_infer", oracle=_INFER_ORACLE)
def q_etl_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference first-row type inference policy on its documented edge
    cases (ref first_lambda_function.py:62-69; FIXTURES.md §B "type
    traps"): digits→INTEGER (leading zeros too), negative ints→FLOAT
    (isdigit is False), empty-first-row→VARCHAR, dates→VARCHAR.
    Oracle = the hand-computed expected DDL types."""
    from end_to_end_aws_data_pipeline_spark.ingest.infer import (
        SPARK_TO_REF,
        infer_schema_first_row,
    )

    header = [
        "﻿TeacherId",  # BOM on first header cell (stripped)
        "TeacherName",
        "DateOfJoining",
        "Salary",
        "LeadingZero",
        "NegativeInt",
        "EmptyFirst",
    ]
    first_row = ["101", "Asha", "03-06-2016", "50000.5", "00123", "-5", ""]
    schema = infer_schema_first_row(header, first_row)
    rows = [(f.name, SPARK_TO_REF[f.dataType.simpleString()]) for f in schema.fields]
    return spark.createDataFrame(rows, schema="column_name string, data_type string")
