"""Accuracy contracts for the sketch-based aggregates (no DuckDB oracle
possible — sketches are engine-specific), asserted against their exact
twins on the same data."""

from __future__ import annotations

import pytest
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


def test_guard_exact_percentile_refuses_big_groups(spark):
    from end_to_end_aws_data_pipeline_spark.operators.percentiles import (
        guard_exact_percentile,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    guard_exact_percentile(li, "l_returnflag")  # under default cap: fine
    with pytest.raises(ValueError, match="binned_exact_percentiles"):
        guard_exact_percentile(li, "l_returnflag", max_rows=100)


def test_binned_exact_matches_builtin_percentile(spark):
    """Tiny bins/cap force several histogram-refinement rounds; the
    result must still equal Spark's buffer-materializing exact
    percentile to the bit."""
    from pyspark.sql import functions as F

    from end_to_end_aws_data_pipeline_spark.operators.percentiles import (
        binned_exact_percentiles,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    ps = [0.25, 0.5, 0.95]
    got = binned_exact_percentiles(
        li, "l_returnflag", "l_extendedprice", ps, bins=8, collect_cap=16
    )
    want_rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.95))"
            ).alias("p")
        )
        .collect()
    )
    for r in want_rows:
        for p, w in zip(ps, r["p"]):
            assert got[r["l_returnflag"]][p] == w, (r["l_returnflag"], p)


def test_binned_exact_constant_and_duplicate_heavy(spark):
    """Stall fallback: intervals that cannot subdivide (constant values,
    two adjacent values) resolve by value-level counting."""
    from end_to_end_aws_data_pipeline_spark.operators.percentiles import (
        binned_exact_percentiles,
    )

    rows = [("a", 5.0)] * 100 + [("b", 1.0)] * 50 + [("b", 2.0)] * 50
    df = spark.createDataFrame(rows, "g: string, v: double")
    got = binned_exact_percentiles(df, "g", "v", [0.0, 0.5, 1.0],
                                   bins=4, collect_cap=8)
    assert got["a"] == {0.0: 5.0, 0.5: 5.0, 1.0: 5.0}
    assert got["b"][0.0] == 1.0 and got["b"][1.0] == 2.0
    assert got["b"][0.5] == 1.5  # interpolated across ranks 49/50


def test_binned_exact_long_group_keys(spark):
    """Group column type flows into the state-table schema — long keys
    must work, not just strings."""
    from end_to_end_aws_data_pipeline_spark.operators.percentiles import (
        binned_exact_percentiles,
    )

    df = spark.range(0, 3000).selectExpr(
        "id % 3 as g", "cast(id as double) as v"
    )
    got = binned_exact_percentiles(df, "g", "v", [0.5], bins=8, collect_cap=16)
    # group g holds values g, g+3, ..., g+2997: median = g + 3*499.5
    for g in (0, 1, 2):
        assert got[g][0.5] == g + 3 * 499.5


def test_binned_exact_group_cardinality_guard(spark):
    from end_to_end_aws_data_pipeline_spark.operators.percentiles import (
        binned_exact_percentiles,
    )

    df = spark.range(0, 100).selectExpr("id as g", "cast(id as double) as v")
    with pytest.raises(ValueError, match="groups"):
        binned_exact_percentiles(df, "g", "v", [0.5], max_groups=10)


def test_hll_replayable_accuracy(spark):
    """The md5-register HLL (oracle-verifiable twin of the native
    HLL++): estimates land within the expected 1.04/sqrt(256) ~ 6.5%
    band (bound at 2.3 sigma; everything is deterministic so this can
    never flake), and the small-range linear-counting branch keeps the
    low-cardinality fixture accurate too (raw HLL overestimates 48%
    there; corrected lands ~1%)."""
    from end_to_end_aws_data_pipeline_spark.operators.percentiles import (
        q_agg_hll_distinct,
    )

    for sf in (SF_SMOKE, "/root/testdata/sf0.01"):
        rows = q_agg_hll_distinct(spark, sf).collect()
        assert len(rows) == 3
        for r in rows:
            assert abs(r.hll_parts - r.exact_parts) / r.exact_parts <= 0.15
