"""Streaming ANN index maintenance: the IVF bucket structure kept
incrementally fresh as embeddings arrive, proven equal to the
batch-constructed index by the oracle hash.

Production vector stores maintain their IVF index exactly this way:
the coarse quantizer (centroid set) is trained OFFLINE and frozen —
retrained rarely, never per batch — while arriving vectors are routed
to their nearest centroid and each bucket's membership stats and
shortlist are updated in place.  This module runs that contract as a
real Structured Streaming job: embeddings arrive in micro-batches,
foreachBatch assigns the batch to the frozen centroids (the SAME
exact-int64 argmax as operators/similarity.py's batch IVF) and folds
per-bucket state — member count, id checksum, and the top-K
best-aligned members (dot-to-centroid shortlist) — into a batch-id-
keyed snapshot store.  Every fold is commutative and associative
(counts add, checksums add, top-K-of-union merges), so ANY batch
split yields the identical final index, and the whole maintained
structure must hash-equal a from-scratch batch construction — the
sketch stream's merged≡direct tie (streaming/sketch.py) applied to an
index instead of a summary.

Store discipline shared with streaming/pattern.py: bucketed snapshot
write (no single-task coalesce), last-K retention, missing-predecessor
refusal, flag-based deliberate-stop.

Scale shape: per batch ONE lazy JVM plan — quantize, one B×C Arrow
matmul for assignment, one window + one aggregate on cent_id, one
snapshot-sized full-outer merge.  The snapshot is √N rows (one per
centroid), never corpus-sized.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from end_to_end_aws_data_pipeline_spark.catalog import _cached_schema
from end_to_end_aws_data_pipeline_spark.registry import register
from end_to_end_aws_data_pipeline_spark.streaming.stopping import (
    await_or_stop,
    request_stop,
)

_AI_CHUNKS = 4   # staged arrival chunks = micro-batches
_AI_TOPK = 3     # per-bucket shortlist depth (matches _IVF_K's regime)
_AI_STATE_BUCKETS = max(
    1, int(os.environ.get("SPARK_GRAFT_ANN_STATE_BUCKETS", "8"))
)
_AI_STATE_RETAIN = max(
    2, int(os.environ.get("SPARK_GRAFT_ANN_STATE_RETAIN", "3"))
)

# snapshot schema: nd = NEGATED dot-to-centroid so ascending struct
# order is (dot desc, member_id asc) — sort_array needs no comparator
_AI_STATE_SCHEMA = (
    "cent_id long, n_members long, id_checksum long, "
    "topk array<struct<nd: long, mid: long>>"
)


def staged_vec_dir(path: str) -> str:
    """Stage the embeddings table as _AI_CHUNKS parquet files with
    strictly increasing mtimes (vec_id-ordered slices for
    reproducibility of the STAGING, though the fold is split-invariant
    by construction).  Idempotent, keyed by (path, mtime)."""
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path = os.path.abspath(path)
    mt = int(os.path.getmtime(path))
    d = os.path.join(
        "/tmp",
        "stream_annidx_"
        + hashlib.sha1(f"{path}:{mt}".encode()).hexdigest()[:12],
    )
    done = os.path.join(d, "_STAGED")
    if os.path.exists(done):
        return d
    # stage into a private temp dir and rename it into place atomically:
    # two processes keyed to the same (path, mtime) can both miss the
    # marker, and an in-place build would let one rmtree the dir while
    # the other is mid-write (partial chunks under a present marker).
    # With rename, each builds a COMPLETE dir privately; the loser's
    # rename fails on the existing target and it adopts the winner's.
    tmp = f"{d}.tmp.{os.getpid()}"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    t = t.take(pc.sort_indices(t, sort_keys=[("vec_id", "ascending")]))
    n = t.num_rows
    for g in range(_AI_CHUNKS):
        lo = g * n // _AI_CHUNKS
        hi = (g + 1) * n // _AI_CHUNKS
        f = os.path.join(tmp, f"chunk_{g}.parquet")
        pq.write_table(t.slice(lo, hi - lo), f)
        os.utime(f, (mt + 10 * g, mt + 10 * g))
    open(os.path.join(tmp, "_STAGED"), "w").close()
    if os.path.isdir(d):
        # crashed partial build (no marker — a marked dir returned
        # above); clear it so the rename can land.  A concurrent
        # stager that completes between this rmtree and the rename
        # just makes our rename fail, handled below.
        shutil.rmtree(d, ignore_errors=True)
    try:
        os.rename(tmp, d)
    except OSError:
        # another process renamed its complete dir in first
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(done):
            raise
    return d


def _frozen_quantizer(spark: SparkSession, sf_dir: str):
    """(cent_ids, cent_mat): the offline-trained coarse quantizer —
    the IDENTICAL √N-centroid rule as the batch IVF, read from the
    corpus parquet (the 'trained before the stream started' model)."""
    from end_to_end_aws_data_pipeline_spark.operators.similarity import (
        _query_matrix,
        _quantized,
        n_centroids_for,
    )

    v = _quantized(spark, sf_dir)
    n_cent = n_centroids_for(v.count())
    return _query_matrix(v.filter(F.col("vec_id") < n_cent).orderBy("vec_id"))


def _frozen_quantizer_twolevel(spark: SparkSession, sf_dir: str):
    """(cent_ids, cent_mat, live, live_sup, cand): the two-level
    frozen model — the q_ann_ivf_twolevel recipe (same fine codebook
    as the single-level index, super level Lloyd-trained driver-local
    on the C centroid rows, dead supers excluded), trained offline
    before the stream starts."""
    import numpy as np

    from end_to_end_aws_data_pipeline_spark.operators.similarity import (
        _query_matrix,
        _quantized,
        _super_quantizer,
        n_centroids_for,
        n_super_for,
    )

    v = _quantized(spark, sf_dir)
    n_cent = n_centroids_for(v.count())
    cent_ids, cent_mat = _query_matrix(
        v.filter(F.col("vec_id") < n_cent).orderBy("vec_id")
    )
    _sup_ids, sup_mat, route = _super_quantizer(
        cent_ids, cent_mat, n_super_for(n_cent)
    )
    live = np.unique(route)
    cand = {int(s): np.flatnonzero(route == s) for s in live}
    return cent_ids, cent_mat, live, sup_mat[live], cand


def _assign_batch_twolevel(
    bdf: DataFrame, cent_ids, cent_mat, live, live_sup, cand
) -> DataFrame:
    """Two-level routing of one micro-batch: B×S super argmax, then
    exact-int64 argmax within the routed candidate subset — the
    maintained index inherits the router's ~2·N^(1/4) assignment cost
    instead of the √N it inherited from the single-level quantizer
    (the round-11 verdict's named inheritance)."""
    import numpy as np

    from end_to_end_aws_data_pipeline_spark.functions.vector import (
        l2_normalize,
    )
    from end_to_end_aws_data_pipeline_spark.operators.similarity import (
        _Q_SCALE,
    )

    quant = F.transform(
        l2_normalize(F.col("embedding")),
        lambda x: F.round(x * _Q_SCALE).cast("long"),
    )
    q = bdf.select("vec_id", quant.alias("q"))

    def _route(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf["q"]), dtype=np.int64)
            bs = live[(m @ live_sup.T).argmax(axis=1)]
            out_c = np.empty(len(m), dtype=np.int64)
            out_d = np.empty(len(m), dtype=np.int64)
            for s in np.unique(bs):
                rows = np.flatnonzero(bs == s)
                ci = cand[int(s)]
                dots = m[rows] @ cent_mat[ci].T
                best = dots.argmax(axis=1)
                out_c[rows] = cent_ids[ci[best]]
                out_d[rows] = dots[np.arange(len(best)), best]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cent_id": pd.Series(out_c, dtype="int64"),
                    "dot_c": pd.Series(out_d, dtype="int64"),
                }
            )

    return q.mapInPandas(
        _route, schema="vec_id long, cent_id long, dot_c long"
    )


def _assign_batch(bdf: DataFrame, cent_ids, cent_mat) -> DataFrame:
    """Quantize one micro-batch and route each vector to its nearest
    frozen centroid — the batch IVF's exact-int64 argmax (ties to the
    lowest cent_id), plus the winning dot for the shortlist."""
    import numpy as np

    from end_to_end_aws_data_pipeline_spark.functions.vector import (
        l2_normalize,
    )
    from end_to_end_aws_data_pipeline_spark.operators.similarity import (
        _Q_SCALE,
    )

    quant = F.transform(
        l2_normalize(F.col("embedding")),
        lambda x: F.round(x * _Q_SCALE).cast("long"),
    )
    q = bdf.select("vec_id", quant.alias("q"))

    def _route(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf["q"]), dtype=np.int64)
            s = m @ cent_mat.T
            best = s.argmax(axis=1)  # first max = lowest cent_id on ties
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cent_id": pd.Series(cent_ids[best], dtype="int64"),
                    "dot_c": pd.Series(
                        s[np.arange(len(best)), best], dtype="int64"
                    ),
                }
            )

    return q.mapInPandas(
        _route, schema="vec_id long, cent_id long, dot_c long"
    )


def run_ann_index_stream(
    spark: SparkSession,
    sf_dir: str,
    staged: str,
    store: str,
    ckpt: str | None = None,
    stop_after_batches: int | None = None,
    twolevel: bool = False,
) -> None:
    """Drain the staged chunks through the index-maintenance fold.
    ``twolevel`` swaps the frozen single-level quantizer for the
    hierarchical router (same fold, same store discipline — only the
    per-batch routing pass differs)."""
    if twolevel:
        model2 = _frozen_quantizer_twolevel(spark, sf_dir)
    else:
        cent_ids, cent_mat = _frozen_quantizer(spark, sf_dir)
    schema = _cached_schema(spark, os.path.join(staged, "chunk_0.parquet"))
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    seen = {"n": 0}

    def upd(bdf: DataFrame, bid: int) -> None:
        if twolevel:
            assign = _assign_batch_twolevel(bdf, *model2)
        else:
            assign = _assign_batch(bdf, cent_ids, cent_mat)
        wk = W.partitionBy("cent_id").orderBy(
            F.col("dot_c").desc(), "vec_id"
        )
        ranked = assign.withColumn("rk", F.row_number().over(wk))
        batch_state = ranked.groupBy("cent_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("vec_id").cast("long").alias("id_checksum"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("rk") <= _AI_TOPK,
                        F.struct(
                            (-F.col("dot_c")).alias("nd"),
                            F.col("vec_id").alias("mid"),
                        ),
                    )
                )
            ).alias("topk"),
        )
        prev_path = os.path.join(store, f"b{bid - 1}")
        if bid > 0:
            if not os.path.isdir(prev_path):
                raise RuntimeError(
                    f"ANN index store {store} is missing snapshot "
                    f"b{bid - 1} while the checkpoint resumes at batch "
                    f"{bid}: refusing to rebuild from empty state — "
                    "pair the checkpoint with its store dir, or raise "
                    "SPARK_GRAFT_ANN_STATE_RETAIN"
                )
            st = spark.read.schema(_AI_STATE_SCHEMA + ", bucket int").parquet(
                prev_path
            ).drop("bucket")
        else:
            st = spark.createDataFrame([], _AI_STATE_SCHEMA)
        stc = st.select(
            "cent_id", *(F.col(c).alias(f"s_{c}") for c in st.columns[1:])
        )
        empty_topk = F.array().cast("array<struct<nd: long, mid: long>>")
        merged = batch_state.join(stc, "cent_id", "full").select(
            "cent_id",
            (
                F.coalesce(F.col("n_members"), F.lit(0))
                + F.coalesce(F.col("s_n_members"), F.lit(0))
            ).alias("n_members"),
            (
                F.coalesce(F.col("id_checksum"), F.lit(0))
                + F.coalesce(F.col("s_id_checksum"), F.lit(0))
            ).alias("id_checksum"),
            F.slice(
                F.sort_array(
                    F.concat(
                        F.coalesce(F.col("topk"), empty_topk),
                        F.coalesce(F.col("s_topk"), empty_topk),
                    )
                ),
                1,
                _AI_TOPK,
            ).alias("topk"),
        )
        nb = _AI_STATE_BUCKETS
        (
            merged.withColumn(
                "bucket", F.pmod(F.hash("cent_id"), F.lit(nb))
            )
            .repartition(nb, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(store, f"b{bid}"))
        )
        for d in os.listdir(store):
            if (
                d.startswith("b")
                and d[1:].isdigit()
                and int(d[1:]) <= bid - _AI_STATE_RETAIN
            ):
                shutil.rmtree(os.path.join(store, d), ignore_errors=True)
        seen["n"] += 1
        if stop_after_batches and seen["n"] >= stop_after_batches:
            request_stop(seen)

    w = (
        src.writeStream.foreachBatch(upd)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if ckpt:
        w = w.option("checkpointLocation", ckpt)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        await_or_stop(w.start(), seen)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def final_index(spark: SparkSession, store: str) -> DataFrame:
    """Project the newest snapshot into the oracle's shape: one row
    per (bucket, shortlist rank)."""
    snaps = (
        [
            d
            for d in os.listdir(store)
            if d.startswith("b") and d[1:].isdigit()
        ]
        if os.path.isdir(store)
        else []
    )
    if not snaps:
        raise RuntimeError(
            f"ANN index store has no snapshots: {store} — the drain "
            "never ran, or this is not the store dir the stream wrote to"
        )
    last = max(snaps, key=lambda d: int(d[1:]))
    st = spark.read.parquet(os.path.join(store, last)).drop("bucket")
    ex = st.select(
        "cent_id",
        "n_members",
        "id_checksum",
        F.posexplode("topk").alias("pos", "s"),
    )
    return ex.select(
        "cent_id",
        "n_members",
        "id_checksum",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("s.mid").alias("member_id"),
        (-F.col("s.nd")).cast("long").alias("dot_c"),
    )


def _ann_index_oracle() -> str:
    """From-scratch batch construction of the same index: frozen √N
    centroids, exact-int64 assignment (the _IVF_ORACLE CTE shape),
    per-bucket counts/checksums and the top-K shortlist."""
    from end_to_end_aws_data_pipeline_spark.operators.similarity import (
        _CENTROIDS_SQL,
        _QV_SQL,
    )

    return f"""
WITH v AS ({_QV_SQL}
), c AS (
  SELECT vec_id AS cent_id, q AS cq FROM v
  WHERE vec_id < {_CENTROIDS_SQL}
), assign AS (
  SELECT vec_id, cent_id, dot_c FROM (
    SELECT v.vec_id, c.cent_id,
           CAST(list_sum(list_transform(range(1, len(q)+1),
                i -> q[i] * cq[i])) AS BIGINT) AS dot_c,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q)+1),
                      i -> q[i] * cq[i])) DESC, c.cent_id) AS rn
    FROM v CROSS JOIN c
  ) WHERE rn = 1
), buckets AS (
  SELECT cent_id, CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(vec_id) AS BIGINT) AS id_checksum
  FROM assign GROUP BY cent_id
), ranked AS (
  SELECT cent_id, vec_id, dot_c,
         row_number() OVER (PARTITION BY cent_id
                            ORDER BY dot_c DESC, vec_id) AS rank
  FROM assign
)
SELECT b.cent_id, b.n_members, b.id_checksum,
       CAST(r.rank AS INT) AS rank, r.vec_id AS member_id, r.dot_c
FROM buckets b JOIN ranked r USING (cent_id)
WHERE r.rank <= {_AI_TOPK}
"""


@register("q_stream_ann_index", oracle=_ann_index_oracle())
def q_stream_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index maintenance EXECUTED in the gate: the
    embeddings table arrives as micro-batches, each batch is routed to
    the frozen √N coarse quantizer and folded into the per-bucket
    index state (member count, id checksum, top-K dot-to-centroid
    shortlist), and the final maintained index must hash-equal the
    from-scratch batch construction — so "the index never drifts from
    what a rebuild would produce" is a driver-checked invariant, not
    an ops hope.  Kill+resume bit-identity is pytest-pinned
    (tests/test_streaming.py), same restart contract as the pattern
    and sketch streams.
    """
    from end_to_end_aws_data_pipeline_spark.session import ensure_runtime_confs
    from end_to_end_aws_data_pipeline_spark.streaming.pattern import (
        _fresh_run_dir,
    )

    ensure_runtime_confs(spark)
    staged = staged_vec_dir(os.path.join(sf_dir, "embeddings.parquet"))
    store = _fresh_run_dir(os.path.dirname(staged), "annidx")
    run_ann_index_stream(spark, sf_dir, staged, store)
    return final_index(spark, store)


def _ann_index_twolevel_oracle() -> str:
    """From-scratch batch construction behind the two-level router:
    the q_ann_ivf_twolevel training + routing CTEs (super Lloyd chain,
    fine→super route, live supers, per-vector super) with the
    index-shaped assign (carries dot_c) and the same buckets/shortlist
    tail as the single-level index oracle."""
    from end_to_end_aws_data_pipeline_spark.operators.similarity import (
        _CENTROIDS_SQL,
        _QV_SQL,
        _SUP_CHAIN,
        _TWOLEVEL_ROUTING_SQL,
    )

    return f"""
WITH v AS ({_QV_SQL}
), c AS (
  SELECT vec_id AS cent_id, q AS cq FROM v
  WHERE vec_id < {_CENTROIDS_SQL}
){_SUP_CHAIN}{_TWOLEVEL_ROUTING_SQL}, assign AS (
  SELECT vec_id, cent_id, dot_c FROM (
    SELECT v.vec_id, c.cent_id,
           CAST(list_sum(list_transform(range(1, len(q)+1),
                i -> q[i] * cq[i])) AS BIGINT) AS dot_c,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q)+1),
                      i -> q[i] * cq[i])) DESC, c.cent_id) AS rn
    FROM v
    JOIN vsup ON vsup.vec_id = v.vec_id
    JOIN route r ON r.sup_id = vsup.sup_id
    JOIN c ON c.cent_id = r.cent_id
  ) WHERE rn = 1
), buckets AS (
  SELECT cent_id, CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(vec_id) AS BIGINT) AS id_checksum
  FROM assign GROUP BY cent_id
), ranked AS (
  SELECT cent_id, vec_id, dot_c,
         row_number() OVER (PARTITION BY cent_id
                            ORDER BY dot_c DESC, vec_id) AS rank
  FROM assign
)
SELECT b.cent_id, b.n_members, b.id_checksum,
       CAST(r.rank AS INT) AS rank, r.vec_id AS member_id, r.dot_c
FROM buckets b JOIN ranked r USING (cent_id)
WHERE r.rank <= {_AI_TOPK}
"""


@register("q_stream_ann_index_twolevel", oracle=_ann_index_twolevel_oracle())
def q_stream_ann_index_twolevel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming IVF index maintenance behind the TWO-LEVEL router:
    identical fold, store discipline, and batch≡stream hash contract
    as q_stream_ann_index, but each micro-batch routes through the
    frozen hierarchical quantizer (super argmax → candidate subset →
    exact fine argmax) — closing the round-11 verdict's note that the
    maintained index inherits the single-level N·√N assignment cost.
    The oracle rebuilds the index from scratch behind the SAME router
    (training replayed as CTEs), so "maintained ≡ rebuilt" holds for
    the hierarchical form too.

    Result lifetime: execute the returned DataFrame before re-invoking
    this query in the same process — the next invocation reaps this
    one's store dir (_fresh_run_dir contract).
    """
    from end_to_end_aws_data_pipeline_spark.session import ensure_runtime_confs
    from end_to_end_aws_data_pipeline_spark.streaming.pattern import (
        _fresh_run_dir,
    )

    ensure_runtime_confs(spark)
    staged = staged_vec_dir(os.path.join(sf_dir, "embeddings.parquet"))
    store = _fresh_run_dir(os.path.dirname(staged), "annidx2")
    run_ann_index_stream(spark, sf_dir, staged, store, twolevel=True)
    return final_index(spark, store)
