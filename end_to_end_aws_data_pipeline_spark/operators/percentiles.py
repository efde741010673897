"""Percentile / approximate aggregates and grouping sets.

Exact percentiles are cross-engine comparable (linear interpolation on
the sorted multiset); sketch-based approximations (HLL++ distinct,
t-digest-ish quantiles) are engine-specific by construction, so those
register without an oracle (driver records rows-only) — their *exact*
twins serve as the accuracy reference in tests/test_approx.py.

At 100 TB the approx forms are the ones you actually run: a single pass,
fixed-size sketch state, map-side mergeable, no sort — versus exact
percentile's per-group sorted materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.registry import register

_PCT_ORACLE = """
SELECT
  l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 6)  AS median_price,
  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
  round(quantile_cont(l_quantity, 0.25), 6)      AS q1_qty,
  round(min(l_extendedprice), 6)                 AS min_price,
  round(max(l_extendedprice), 6)                 AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_agg_percentiles", oracle=_PCT_ORACLE)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median / p95 / q1).

    Both price percentiles come from ONE array-percentile aggregate —
    one sorted materialization of the column per group instead of two.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("__p"),
            F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q1_qty"),
            F.round(F.min("l_extendedprice"), 6).alias("min_price"),
            F.round(F.max("l_extendedprice"), 6).alias("max_price"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("__p", 1), 6).alias("median_price"),
            F.round(F.element_at("__p", 2), 6).alias("p95_price"),
            "q1_qty",
            "min_price",
            "max_price",
        )
    )


@register("q_agg_approx")  # sketches are engine-specific: rows-only check
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass sketch aggregates: HLL++ distinct + approx quantiles.

    Accuracy vs the exact twins is asserted in tests/test_approx.py
    (HLL++ rsd 5%, quantile within 1% rank error).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("approx_p95"),
    )


_GSETS_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*) AS n_orders,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("q_agg_grouping_sets", oracle=_GSETS_ORACLE)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (distinct from rollup/cube shapes)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT
          o_orderstatus,
          o_orderpriority,
          count(*) AS n_orders,
          count(DISTINCT o_custkey) AS n_custs
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
