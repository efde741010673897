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


def _ensure_lineitem_orc(spark: SparkSession, sf_dir: str) -> str:
    out = _derived_dir(sf_dir, "orc")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        # partitioned sink: one directory per l_returnflag value, so the
        # scan side can show partition pruning on an ORC source too
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
        ).write.mode("overwrite").partitionBy("l_returnflag").orc(out)
    return out


_ORC_ORACLE = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
       {dsum_sql("l_quantity", 2)} AS sum_qty,
       {dsum_sql("l_extendedprice", 2)} AS sum_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_source_orc_scan", oracle=_ORC_ORACLE)
def q_source_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → partitioned ORC sink → ORC scan → aggregate: the other
    columnar format Spark ships natively (Avro is an external jar, not
    available offline — documented gap). Values must survive the format
    round-trip exactly for the hash to match the parquet-side oracle;
    the partitionBy(l_returnflag) layout keeps the partition column
    prunable on read."""
    path = _ensure_lineitem_orc(spark, sf_dir)
    df = spark.read.orc(path)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").cast("long").alias("key_checksum"),
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_price"),
    )


_BINFILE_N = 24  # staged image files: bounded, deterministic

_BINFILE_ORACLE = f"""
SELECT doc_id,
       CAST((4 + doc_id % 29) * (4 + (doc_id // 7) % 23) * 3 + 54
            + CASE WHEN ((4 + doc_id % 29) * 3) % 4 = 0 THEN 0
              ELSE (4 + (doc_id // 7) % 23) * (4 - ((4 + doc_id % 29) * 3) % 4)
              END AS BIGINT) AS n_bytes,
       CAST(3 * list_sum(list_transform(
             range(0, (4 + doc_id % 29) * (4 + (doc_id // 7) % 23)),
             i -> (i % (4 + doc_id % 29) + i // (4 + doc_id % 29) + doc_id)
                  % 256)) AS BIGINT) AS pixel_sum
FROM documents WHERE doc_id < {_BINFILE_N}
"""


@register("q_source_binaryfile_scan", oracle=_BINFILE_ORACLE)
def q_source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's `binaryFile` source — how a multimodal corpus actually
    enters the engine from an object store (one row per file: path,
    length, content bytes) — feeding the pure-python BMP decoder.

    Staging: the first {n} documents are rendered as real BMP files on
    disk (deterministic gradient, same derivation as
    q_multimodal_decode); the scan reads them back via binaryFile,
    extracts doc_id from the file name, and decodes content to
    pixel_sum. The oracle recomputes byte size (54-byte header + padded
    BGR rows) and pixel sum arithmetically.
    """
    import numpy as np

    from end_to_end_aws_data_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
    )

    out = _derived_dir(sf_dir, "binfile")
    done = os.path.join(out, "_STAGED")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        for doc_id in range(_BINFILE_N):
            w = 4 + doc_id % 29
            h = 4 + (doc_id // 7) % 23
            yy, xx = np.mgrid[0:h, 0:w]
            val = ((xx + yy + doc_id) % 256).astype(np.uint8)
            pix = np.repeat(val[:, :, None], 3, axis=2)
            with open(os.path.join(out, f"doc_{doc_id:05d}.bmp"), "wb") as f:
                f.write(encode_bmp(pix))
        with open(done, "w") as f:
            f.write("ok")

    files = spark.read.format("binaryFile").load(out + "/*.bmp")

    def _decode(it):
        for pdf in it:
            ids, sums = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                ids.append(int(path.rsplit("doc_", 1)[1].split(".")[0]))
                img = decode_image(bytes(content))
                sums.append(int(img.astype(np.int64).sum()))
            import pandas as pd

            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pdf["length"].astype("int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return files.select("path", "length", "content").mapInPandas(
        _decode, schema="doc_id long, n_bytes long, pixel_sum long"
    )
