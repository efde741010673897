"""Capstone composition: an end-to-end LLM training-data curation
pipeline as ONE declarative plan — quality filter → exact dedup →
near-dup removal → per-language corpus stats.

This is the workload the engine exists for (BASELINE.json north star):
each stage is an operator from this repo, composed lazily so Catalyst
optimizes across stage boundaries (the quality filter prunes the
corpus BEFORE dedup shuffles it; only survivors reach the quadratic-ish
near-dup stage).

Deterministic keep policy throughout: lowest doc_id survives its
duplicate group — so the whole pipeline is order-insensitive and
oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.operators.dedup import shingles
from end_to_end_aws_data_pipeline_spark.registry import register

_MIN_WORDS = 20
_MAX_STOPRATIO = 0.12
_NEARDUP_TAU = 0.6
_STOPWORDS = ("the", "a", "of", "and")

_PIPE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS w
  FROM documents
), quality AS (
  SELECT doc_id, lang, text FROM scored
  WHERE len(w) >= {_MIN_WORDS}
    AND CAST(len(list_filter(w, x -> x IN {_STOPWORDS})) AS DOUBLE) / len(w)
        <= {_MAX_STOPRATIO}
), exact_kept AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY text
), surviving AS (
  SELECT q.doc_id, q.lang, q.text FROM quality q
  JOIN exact_kept k ON q.doc_id = k.doc_id
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
           -- concat_ws skips NULLs (same as Spark), so docs with <3
           -- words emit the truncated window instead of a NULL shingle
           i -> concat_ws(' ', string_split(text,' ')[i],
                string_split(text,' ')[i+1], string_split(text,' ')[i+2])
         )) AS s
  FROM surviving
), tok AS (
  SELECT doc_id, unnest(s) AS shingle FROM sh
), sizes AS (
  SELECT doc_id, len(s) AS n FROM sh
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), neardup_pairs AS (
  SELECT doc_a, doc_b FROM shared
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= {_NEARDUP_TAU}
), final AS (
  SELECT s.doc_id, s.lang, s.text FROM surviving s
  WHERE s.doc_id NOT IN (SELECT doc_b FROM neardup_pairs)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(list_sum(list_transform(string_split(text, ' '),
            x -> (length(x) + 3) // 4))) AS BIGINT) AS bpe_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM final
GROUP BY lang
"""


@register("q_pipeline_training_data", oracle=_PIPE_ORACLE)
def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality gate → exact dedup → near-dup removal
    (higher doc_id of any Jaccard ≥ 0.6 pair dropped) → per-language
    token accounting. One lazy plan; the scan feeds every stage once."""
    d = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    stop_ratio = (
        F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS))).cast("double") / F.size(w)
    )
    quality = d.filter(
        (F.size(w) >= _MIN_WORDS) & (stop_ratio <= _MAX_STOPRATIO)
    ).select("doc_id", "lang", "text")

    exact_kept = quality.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    surviving = quality.join(exact_kept.select("doc_id"), "doc_id")

    sh = surviving.select("doc_id", shingles(F.col("text")).alias("s"))
    tok = sh.select("doc_id", F.explode("s").alias("shingle"))
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    drop = (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(jac >= _NEARDUP_TAU)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = surviving.join(drop, "doc_id", "left_anti")

    bpe = F.aggregate(
        F.split(F.col("text"), " "),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.floor((F.length(x) + 3) / 4),
    )
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe).cast("long").alias("bpe_tokens"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )
