"""Similarity search over embedding columns (BASELINE.json mandate):
brute-force cosine top-k as the exactness baseline, IVF (inverted-file)
partitioned search as the scale path (ICDE'21 / EDBT'20 top-k
similarity-search shape, PAPERS.md).

Scale posture:
- brute force is O(|Q|·N): fine when the query set broadcasts; the
  fact side streams through one scan, top-k folds per partition before
  the final merge (window + filter → partial TakeOrdered under AQE).
- IVF makes search sub-linear: vectors are bucketed by nearest
  centroid once (linear pass), queries probe only their bucket(s).
  Centroid count √N keeps both passes balanced; buckets are the join
  key, so probing is an equi-join, not a cross product.
- both paths are pure expressions (zip_with folds) — bit-deterministic,
  oracle-checkable, no Python in the row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.functions.vector import cosine
from end_to_end_aws_data_pipeline_spark.registry import register

_TOP_K = 5
_QUERY_MOD = 100  # vec_id % 100 == 0 → deterministic query set at any SF
_MAX_QUERIES = 64  # hard cap on the broadcast query side: without it the
# %100 sample grows as N/100 and the broadcast eventually stops fitting;
# with it the driver-side state is O(1) in corpus size. Larger query
# sets should loop in _MAX_QUERIES-sized batches (one scan each).

_BRUTE_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM v
  WHERE vec_id % {_QUERY_MOD} = 0
  ORDER BY vec_id LIMIT {_MAX_QUERIES}
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * v.e[i]))
           / (qn * v.nrm) AS cos
  FROM q JOIN v ON v.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       round(cos, 6) AS cosine
FROM ranked WHERE rank <= {_TOP_K}
"""


@register("q_ann_bruteforce_topk", oracle=_BRUTE_ORACLE)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a broadcast query set.

    The query side is bounded (%-sampled, then capped at _MAX_QUERIES
    via TakeOrdered) → broadcast-NL join against the full table; one
    scan of the big side, no shuffle of it, and the broadcast stays
    O(1) as the corpus grows. The window ranks deterministically
    (cosine desc, then neighbor id).
    """
    v = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = (
        v.filter(F.col("vec_id") % _QUERY_MOD == 0)
        .orderBy("vec_id")
        .limit(_MAX_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# IVF: coarse-quantized buckets, nprobe=1
# ---------------------------------------------------------------------------

_IVF_K = 3
# ceil(sqrt(N)) centroids — the classic IVF balance point: assignment is
# N·√N dot products, each probe list averages √N vectors. Expressed as a
# scalar subquery in the oracle so Spark and DuckDB derive the SAME
# quantizer from the data at any SF.
_CENTROIDS_SQL = (
    "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)"
)


def n_centroids_for(n_rows: int) -> int:
    """√N coarse-quantizer size (must mirror _CENTROIDS_SQL exactly)."""
    import math

    return max(1, int(math.ceil(math.sqrt(n_rows))))


@register("q_ann_lsh_projection")  # ml-lib hash seeds → rows-only check
def q_ann_lsh_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection LSH similarity join via spark.ml
    (BucketedRandomProjectionLSH is euclidean-only, so vectors are
    unit-normalized first: for unit vectors, ‖a−b‖² = 2(1−cos) — a
    euclidean threshold IS a cosine threshold).

    cosine ≥ 0.35 ⇔ distance ≤ √(2·(1−0.35)) ≈ 1.140. Deterministic
    seed; approxSimilarityJoin is the all-pairs scale path (bucketed
    shuffle join, sub-quadratic candidates). Recall vs the exact pairs
    is asserted in tests/test_llm_ops.py.
    """
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import VectorUDT  # noqa: F401 (ml presence)

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("raw"),
    )
    unit = Normalizer(inputCol="raw", outputCol="unit", p=2.0).transform(e).select(
        "vec_id", "unit"
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="unit", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    ).fit(unit)
    tau_dist = math.sqrt(2.0 * (1.0 - 0.35))
    pairs = lsh.approxSimilarityJoin(unit, unit, tau_dist, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 6).alias("cosine_est"),
        )
    )

_IVF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
), c AS (
  SELECT vec_id AS cent_id, e AS ce, nrm AS cn FROM v
  WHERE vec_id < {_CENTROIDS_SQL}
), assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT v.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, len(e)+1),
                      i -> e[i] * ce[i])) / (nrm * cn) DESC, c.cent_id) AS rn
    FROM v CROSS JOIN c
  ) WHERE rn = 1
), q AS (
  SELECT v.vec_id AS query_id, v.e AS qe, v.nrm AS qn, a.cent_id
  FROM v JOIN assign a USING (vec_id)
  WHERE v.vec_id % {_QUERY_MOD} = 0
  ORDER BY v.vec_id LIMIT {_MAX_QUERIES}
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id, q.cent_id,
         list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * v.e[i]))
           / (qn * v.nrm) AS cos
  FROM q
  JOIN assign a ON a.cent_id = q.cent_id
  JOIN v ON v.vec_id = a.vec_id AND v.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cent_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(cent_id AS BIGINT) AS probed_centroid,
       CAST(rank AS INT) AS rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {_IVF_K}
"""


@register("q_ann_ivf_topk", oracle=_IVF_ORACLE)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: bucket every vector by nearest centroid
    (deterministic coarse quantizer: the first ceil(√N) vectors), then
    each query searches only its own bucket (nprobe=1).

    C = ceil(√N) scales the quantizer with the corpus — assignment is
    N·√N dots, probe lists average √N vectors — instead of a fixed
    constant that degenerates to brute force per bucket as N grows.
    Assignment is a broadcast-NL pass (C rows broadcast); search is an
    equi-join on the centroid id — the sub-linear structure that
    replaces brute force at scale. The query set is capped at
    _MAX_QUERIES so its broadcast is O(1) in N. Recall vs brute force
    is asserted in tests; raising nprobe trades cost for recall.
    """
    v = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_cent = n_centroids_for(v.count())  # parquet-metadata count: cheap
    c = v.filter(F.col("vec_id") < n_cent).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )
    sim_to_cent = cosine(F.col("embedding"), F.col("c_emb"))
    aw = W.partitionBy("vec_id").orderBy(F.col("__cs").desc(), F.col("cent_id"))
    assign = (
        v.crossJoin(F.broadcast(c))
        .select("vec_id", "embedding", "cent_id", sim_to_cent.alias("__cs"))
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cent_id")
    )
    q = (
        assign.filter(F.col("vec_id") % _QUERY_MOD == 0)
        .orderBy("vec_id")
        .limit(_MAX_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cent_id"),
        )
    )
    scored = (
        assign.join(F.broadcast(q), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("cent_id").cast("long").alias("probed_centroid"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IVF_K)
        .select(
            "query_id",
            "neighbor_id",
            "probed_centroid",
            "rank",
            F.round("cos", 6).alias("cosine"),
        )
    )
