"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``end_to_end_aws_data_pipeline_spark.registry``: each
engine operator module registers its queries + DuckDB oracle SQL there;
this file stays stable while coverage grows.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from end_to_end_aws_data_pipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from end_to_end_aws_data_pipeline_spark.operators.relational import (
        q1_pricing_summary,
    )

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return registry.oracle_sql()
