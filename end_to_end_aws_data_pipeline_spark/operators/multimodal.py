"""Multimodal (image/audio/video) column handling: opaque ``binary``
payloads + typed metadata structs, with decode / feature-extraction /
frame-sampling as Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``NotImplementedError`` unless a real decoder is
importable), while everything Spark-side is real and tested: the
binary schema convention, partition-count preservation, the
mapInPandas batch iterator signature, and a deterministic
feature-extraction that the DuckDB oracle can verify arithmetically.

Scale notes: binary payloads ride in parquet as byte arrays; metadata
lives in a sibling struct so filters on media_type/size prune row
groups WITHOUT touching payload bytes (column pruning keeps the scan
narrow). mapInPandas processes Arrow batches — payload bytes cross to
Python once per batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.registry import register

# schema convention for multimodal tables
BINARY_DOC_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<media_type: string, n_bytes: long, source: string>"
)

_FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, first_byte int, "
    "fake_width long, fake_height long, checksum8 long"
)


def to_binary_docs(documents: DataFrame, media_type: str = "image/fake") -> DataFrame:
    """documents(text) → multimodal convention: utf-8 payload bytes +
    metadata struct (the BinaryType + struct pattern of SURVEY.md §2.B
    "multimodal columns")."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: decode an image payload to (height, width, channels) pixels.

    No codec library ships in this environment; plug one in by
    replacing this function (e.g. PIL.Image.open over io.BytesIO).
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires a codec library (e.g. pillow); "
            "not available in this environment — deterministic fake "
            "features are used instead (extract_features)"
        ) from e
    raise NotImplementedError("real decode path not wired in this build")


def extract_features(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Stands in for decode→resize→embed: computes deterministic
    arithmetic features (dimensions faked from byte stats) so the full
    mapInPandas pipeline — batch iterator in, batch out, schema
    contract — is exercised and oracle-checkable.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # one python pass over the batch's payload bytes
            stats = [
                (len(b), b[0] if b else -1, int(sum(b[:8])))
                for b in pdf["payload"]
            ]
            n_bytes = pd.Series([s[0] for s in stats], dtype="int64")
            first = pd.Series([s[1] for s in stats], dtype="int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "fake_width": (16 + n_bytes % 64).astype("int64"),
                    "fake_height": (16 + first % 48).astype("int64"),
                    "checksum8": pd.Series([s[2] for s in stats], dtype="int64"),
                }
            )

    # flatten the struct JVM-side: Arrow then ships two flat columns
    # instead of per-row struct objects (visibly cheaper conversion)
    flat = binary_docs.select(
        "doc_id", "payload", F.col("meta.media_type").alias("media_type")
    )
    return flat.mapInPandas(_batches, schema=_FEATURE_SCHEMA)


def sample_frames(binary_docs: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling stub: pick n evenly-spaced byte offsets per
    payload (the real operator would seek keyframes); shows the
    explode-to-frames shape downstream operators consume."""
    # integer floor division: double-cast rounding differs across engines
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.floor(i * F.col("meta.n_bytes") / n_frames).cast("long"),
    )
    return binary_docs.select(
        "doc_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


_MM_ORACLE = """
WITH b AS (
  SELECT doc_id, text, encode(text) AS payload, source FROM documents
)
SELECT
  doc_id,
  'image/fake' AS media_type,
  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
  CAST(ascii(text[1]) AS INT) AS first_byte,
  CAST(16 + octet_length(payload) % 64 AS BIGINT) AS fake_width,
  CAST(16 + ascii(text[1]) % 48 AS BIGINT) AS fake_height,
  CAST(list_sum(list_transform(string_split(substring(text, 1, 8), ''),
       c -> ascii(c))) AS BIGINT) AS checksum8
FROM b
"""


@register("q_multimodal_features", oracle=_MM_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: text → binary payload + meta
    struct → Arrow-batched mapInPandas feature extraction. The oracle
    recomputes the same features arithmetically in SQL (ASCII text ⇒
    utf-8 bytes == character codes), independently validating the UDF
    path."""
    docs = table(spark, sf_dir, "documents")
    return extract_features(to_binary_docs(docs))


_FRAME_ORACLE = """
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       (i * octet_length(encode(text))) // 4 AS byte_offset
FROM documents, (SELECT unnest([0,1,2,3]) AS i)
"""


@register("q_multimodal_frame_sample", oracle=_FRAME_ORACLE)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: evenly-spaced offsets exploded to one
    row per (doc, frame)."""
    docs = table(spark, sf_dir, "documents")
    return sample_frames(to_binary_docs(docs))
