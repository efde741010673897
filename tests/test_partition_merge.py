"""Partition-scoped merge: IO proportional to the delta — untouched
partition files must remain byte-identical (same inodes/mtimes)."""

from __future__ import annotations

import glob
import os

from end_to_end_aws_data_pipeline_spark.ingest.merge import merge_into_parquet


def _part_files(target, value):
    return sorted(glob.glob(os.path.join(target, f"dt={value}", "*.parquet")))


def test_partition_scoped_merge_rewrites_only_touched(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3")],
        "k int, v string, dt string",
    )
    n = merge_into_parquet(spark, target, base, keys=["k"], partition_by="dt")
    assert n == 4
    d1_before = {(f, os.path.getmtime(f)) for f in _part_files(target, "d1")}
    d3_before = {(f, os.path.getmtime(f)) for f in _part_files(target, "d3")}
    assert d1_before and d3_before

    updates = spark.createDataFrame(
        [(3, "C2", "d2"), (5, "e", "d2"), (6, "f", "d4")], "k int, v string, dt string"
    )
    n = merge_into_parquet(spark, target, updates, keys=["k"], partition_by="dt")
    assert n == 6

    # untouched partitions: identical files, untouched mtimes
    assert {(f, os.path.getmtime(f)) for f in _part_files(target, "d1")} == d1_before
    assert {(f, os.path.getmtime(f)) for f in _part_files(target, "d3")} == d3_before

    got = {(r.k, r.v, r.dt) for r in spark.read.parquet(target).collect()}
    assert got == {
        (1, "a", "d1"), (2, "b", "d1"),
        (3, "C2", "d2"), (5, "e", "d2"),  # d2 merged
        (4, "d", "d3"),
        (6, "f", "d4"),  # new partition appended
    }


def test_partition_scoped_merge_creates_table(spark, tmp_path):
    target = str(tmp_path / "fresh")
    df = spark.createDataFrame([(1, "a", "d1")], "k int, v string, dt string")
    assert merge_into_parquet(spark, target, df, keys=["k"], partition_by="dt") == 1
    assert os.path.isdir(os.path.join(target, "dt=d1"))


def test_partition_scoped_merge_rejects_null_partition_key(spark, tmp_path):
    import pytest

    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", "d1")], "k int, v string, dt string")
    merge_into_parquet(spark, target, base, keys=["k"], partition_by="dt")
    nulled = spark.createDataFrame([(2, "b", None)], "k int, v string, dt string")
    with pytest.raises(ValueError, match="NULL"):
        merge_into_parquet(spark, target, nulled, keys=["k"], partition_by="dt")


def test_upsert_rejects_schema_drift(spark):
    import pytest

    from end_to_end_aws_data_pipeline_spark.ingest.merge import upsert

    base = spark.createDataFrame([(1, "a", 1.0)], "k int, v string, x double")
    narrower = spark.createDataFrame([(1, "b")], "k int, v string")
    wider = spark.createDataFrame([(1, "b", 1.0, 9)], "k int, v string, x double, y int")
    with pytest.raises(ValueError, match="missing columns \\['x'\\]"):
        upsert(base, narrower, ["k"])
    with pytest.raises(ValueError, match="unexpected columns \\['y'\\]"):
        upsert(base, wider, ["k"])


def test_whole_table_merge_swap_leaves_no_debris(spark, tmp_path):
    target = str(tmp_path / "state")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    merge_into_parquet(spark, target, base, keys=["k"])
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    assert merge_into_parquet(spark, target, upd, keys=["k"]) == 3
    got = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # both rename-aside staging dirs are gone after a clean merge
    assert not os.path.exists(target + ".__merge_tmp")
    assert not os.path.exists(target + ".__merge_old")
