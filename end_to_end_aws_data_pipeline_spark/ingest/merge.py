"""Keyed upsert (MERGE): the reference's row-by-row
``INSERT ... ON DUPLICATE KEY UPDATE`` (delta_load.py:169-202, one
network round-trip + commit per row) as a set-based distributed merge.

Two forms:
- ``upsert(base, updates, keys)``: pure-DataFrame merge — new rows
  appended, matching keys replaced by the update side. One shuffle on
  the key columns. This is what Delta's MERGE INTO compiles to for
  insert-or-replace, without needing lake-format jars.
- ``merge_into_parquet``: applies ``upsert`` against a parquet table on
  disk (read-modify-write). At lake scale you would partition the
  target and rewrite only affected partitions — noted inline.

The reference never declares a primary key (SURVEY.md §1.2), so its
"upsert" silently degrades to append. We make the key explicit and
required — the honest version of the same contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F  # noqa: F401 (used across merge paths)


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Insert-or-replace by key: updates win over base on key collision.

    updates must be unique per key (enforced upstream); base may hold at
    most one row per key (a table invariant this function preserves).
    Implementation: tag + union + one window over the key taking the
    highest-precedence row — a single hash shuffle, no join needed.

    Schema drift between deliveries (a realistic CSV-pipeline input) is
    rejected loudly: an increment with missing columns would otherwise
    silently drop those columns from every existing row, and one with
    extra columns would fail with an opaque AnalysisException.
    """
    if set(base.columns) != set(updates.columns):
        missing = sorted(set(base.columns) - set(updates.columns))
        extra = sorted(set(updates.columns) - set(base.columns))
        raise ValueError(
            f"upsert schema drift: updates missing columns {missing}, "
            f"unexpected columns {extra}; align the increment's schema "
            f"to the table (or migrate the table) before merging"
        )
    tagged_base = base.select(*updates.columns).withColumn("__prec", F.lit(0))
    tagged_upd = updates.withColumn("__prec", F.lit(1))
    w = W.partitionBy(*keys).orderBy(F.col("__prec").desc())
    return (
        tagged_base.unionByName(tagged_upd)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prec", "__rn")
    )


def merge_into_parquet(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: list[str],
    partition_by: str | None = None,
) -> int:
    """Upsert ``updates`` into the parquet table at ``target_dir``;
    creates it if absent. Returns the resulting row count.

    With ``partition_by`` set (which must be one of ``keys``' hash
    inputs — every key lives in exactly one partition), the merge is
    partition-scoped: only partitions present in ``updates`` are read
    and rewritten via dynamic partition overwrite, so IO is
    proportional to the delta, not the table — the shape that holds at
    100 TB. Without it: whole-table read-modify-write (fine for small
    state tables like the watermarks).
    """
    if partition_by is not None and os.path.exists(target_dir):
        return _merge_partition_scoped(spark, target_dir, updates, keys, partition_by)
    if os.path.exists(target_dir):
        base = spark.read.parquet(target_dir)
        merged = upsert(base, updates, keys)
    else:
        merged = updates
        if partition_by is not None:
            merged.write.mode("overwrite").partitionBy(partition_by).parquet(target_dir)
            return spark.read.parquet(target_dir).count()
    # write-to-temp, rename old aside, promote, then delete old: never
    # overwrite the directory still being scanned by the merge plan, and
    # a valid table directory exists at target_dir at every instant —
    # a crash between the two renames leaves the .__merge_old dir to
    # clean up, never a missing table
    tmp_dir = target_dir.rstrip("/") + ".__merge_tmp"
    old_dir = target_dir.rstrip("/") + ".__merge_old"
    merged.write.mode("overwrite").parquet(tmp_dir)
    n = spark.read.parquet(tmp_dir).count()
    import shutil

    if os.path.exists(old_dir):  # leftover from an interrupted merge
        shutil.rmtree(old_dir)
    had_target = os.path.exists(target_dir)
    if had_target:
        os.replace(target_dir, old_dir)
    os.replace(tmp_dir, target_dir)
    if had_target:
        shutil.rmtree(old_dir)
    return n


def _merge_partition_scoped(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: list[str],
    partition_by: str,
) -> int:
    """Merge touching only the partitions ``updates`` lands in.

    1. collect the (small) set of affected partition values;
    2. read ONLY those partitions of the base (partition pruning);
    3. upsert within them;
    4. dynamic-partition-overwrite writes back just those directories.
    Untouched partition files are never read or rewritten.
    """
    affected = [r[0] for r in updates.select(partition_by).distinct().collect()]
    if any(v is None for v in affected):
        # isin() below never matches NULL, so a NULL partition key would
        # silently skip the upsert against existing null-partition rows
        # (__HIVE_DEFAULT_PARTITION__) and could duplicate keys there
        raise ValueError(
            f"updates contain NULL values in partition column "
            f"{partition_by!r}; partition keys must be non-null for a "
            f"partition-scoped merge"
        )
    base = spark.read.parquet(target_dir)
    base_affected = base.filter(F.col(partition_by).isin(affected))
    merged = upsert(base_affected, updates, keys)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_by)
        .parquet(target_dir)
    )
    return spark.read.parquet(target_dir).count()
