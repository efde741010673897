"""Catalog probe + dynamic DDL sink (SURVEY.md §2.A rows 6-7).

Reference behavior: ``check_rds_table`` probes information_schema with
f-string SQL and aborts the load when the table is missing
(ref delta_load.py:116-155); ``create_rds_table`` emits
``CREATE TABLE IF NOT EXISTS`` from the inferred schema
(ref first_lambda_function.py:92-132). Spark's catalog gives both
natively — and safely (no SQL-string interpolation of user input
beyond identifier quoting).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from end_to_end_aws_data_pipeline_spark.ingest.infer import SPARK_TO_REF


def table_exists(spark: SparkSession, name: str) -> bool:
    """Catalog existence probe (ref delta_load.py:116-155, minus the
    injectable f-string SQL)."""
    return spark.catalog.tableExists(name)


def ddl_for_schema(name: str, schema: T.StructType, reference_types: bool = False) -> str:
    """CREATE TABLE IF NOT EXISTS DDL from a StructType.

    ``reference_types=True`` renders the legacy MySQL-style type names
    (INTEGER/FLOAT/VARCHAR(255)) for auditing parity with the DDL the
    reference would have produced (ref first_lambda_function.py:101-105);
    otherwise Spark SQL types.
    """
    cols = []
    for f in schema.fields:
        t = (
            SPARK_TO_REF.get(f.dataType.simpleString(), f.dataType.simpleString())
            if reference_types
            else f.dataType.simpleString()
        )
        cols.append(f"`{f.name}` {t}")
    return f"CREATE TABLE IF NOT EXISTS `{name}` ({', '.join(cols)}) USING PARQUET"


def create_table_if_not_exists(
    spark: SparkSession, name: str, schema: T.StructType
) -> bool:
    """Dynamic DDL sink; returns True if the table was created, False if
    it already existed (first-write-wins schema, like the reference's
    CREATE IF NOT EXISTS + frozen DDL, SURVEY.md §1.2)."""
    existed = table_exists(spark, name)
    if not existed:
        spark.sql(ddl_for_schema(name, schema))
    return not existed
