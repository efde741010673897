"""Streaming MATCH_RECOGNIZE: row-pattern detection as a stateful
stream, proven equal to the batch composition by the oracle hash.

The round-9 batch operator (operators/sweep.py q_events_pattern_match)
compiles the SQL:2016 pattern ``click view+ purchase`` into run-length
encoding + lag/lead over runs. This module runs the SAME semantics on
the streaming surface: events arrive in time-ordered micro-batches,
per-user run state (the current run and the one before it) lives in
``applyInPandasWithState`` GroupState, and a match is recorded the
moment the event that CLOSES a view-run arrives — exactly when a
streaming MATCH_RECOGNIZE (Flink CEP-style) would fire it. The final
per-user stats must hash-equal the batch composition's oracle, which is
the batch≡stream tie this family already holds for aggregates
(q_stream_stateful_user_aggs) and sketches (streaming/sketch.py).

Why per-key state is BOUNDED at 100 TB: the fold keeps two run
descriptors and four counters per user — O(1) per key regardless of
event count, strictly smaller than the sessionizer's state. The one
real requirement is per-key event-time order across micro-batches; the
staging helper models the production contract (a log ingested in
time-ordered chunks — Kafka partitions by key, date-partitioned files).
Out-of-order arrival would need a watermark-deep reorder buffer in
state, which is what real CEP engines do; that variant is named, not
built.

Reference anchor: the reference processes files strictly in timestamp
order via its watermark gate (delta_load.py:204-265) — the same
in-order-arrival contract this operator states for events.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import re
import shutil
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import _cached_schema
from end_to_end_aws_data_pipeline_spark.registry import register
from end_to_end_aws_data_pipeline_spark.streaming.stopping import (
    await_or_stop,
    request_stop,
)

_counter = itertools.count()

_PM_BUCKETS = 4  # staged time-ordered chunks = micro-batches

# state-store sharding: the carried per-user snapshot is written as
# N_BUCKETS bucket-pure files (hash(user_id) % N), partitionBy'd on the
# bucket — the sharded-Bloom store layout (dedup.py digest_bloom_sharded)
# applied to streaming state.  A coalesce(1) snapshot was a single-task
# write that serializes at 100x users; bucketed, the write is N parallel
# tasks and a production MERGE can address one bucket at a time.
_RLE_STATE_BUCKETS = max(
    1, int(os.environ.get("SPARK_GRAFT_PATTERN_STATE_BUCKETS", "8"))
)
# snapshots older than (newest - RETAIN) are retired after each batch
# commit: availableNow replay redelivers at most the last uncommitted
# batch, which re-reads only its immediate predecessor, so RETAIN=2 is
# strictly sufficient — 3 leaves a margin.  Without retirement the
# store grows O(batches x users).
_RLE_STATE_RETAIN = max(
    2, int(os.environ.get("SPARK_GRAFT_PATTERN_STATE_RETAIN", "3"))
)

def _fresh_run_dir(base: str, prefix: str) -> str:
    """Allocate a per-invocation output dir under ``base`` and reap
    stale siblings: dirs left by DEAD processes, plus this process's
    own previous dir for the same prefix (by the time a query is
    invoked again, its previous invocation's result DataFrame has been
    executed — the gate/bench/pytest contract).  Live other-process
    dirs are left alone.  Without reaping, every gate/bench run leaked
    one sink dir and one state store into /tmp forever."""
    pat = re.compile(rf"^{re.escape(prefix)}_(\d+)_\d+$")
    me = os.getpid()
    try:
        names = os.listdir(base)
    except OSError:
        names = []
    for name in names:
        m = pat.match(name)
        if not m:
            continue
        pid = int(m.group(1))
        stale = pid == me
        if not stale:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                stale = True
            except OSError:
                pass  # alive but not ours (EPERM) — leave it
        if stale:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
    return os.path.join(base, f"{prefix}_{me}_{next(_counter)}")

# state: the previous run's type, the open run (type, length, start),
# and the accumulated match stats. first_us is -1 until the first
# match (state schemas have no usable NULL sentinel for longs).
_PM_STATE_SCHEMA = (
    "prev_t string, cur_t string, cur_len long, cur_start_us long, "
    "n_matches long, views_matched long, longest long, first_us long"
)
_PM_OUT_SCHEMA = (
    "user_id long, n_matches long, views_matched long, "
    "longest_view_run long, first_match_ts timestamp"
)


def staged_time_dir(path: str) -> str:
    """Stage the events table as _PM_BUCKETS parquet files, each a
    CONTIGUOUS slice of the (ts, event_id) global order, mtimes strictly
    increasing so the file source replays them as in-order micro-batches
    (maxFilesPerTrigger=1). This is the arrival model the operator's
    correctness contract states: per-key event order across batches.

    Sorting uses the µs-TRUNCATED timestamp (the engine-wide ns→µs
    normalization) with event_id tiebreak — raw-ns order could split a
    µs-tie across two buckets in the opposite order from the batch
    composition's ORDER BY. Idempotent, keyed by (path, mtime).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path = os.path.abspath(path)
    mt = int(os.path.getmtime(path))
    d = os.path.join(
        "/tmp",
        "stream_pattern_"
        + hashlib.sha1(f"{path}:{mt}".encode()).hexdigest()[:12],
    )
    done = os.path.join(d, "_STAGED")
    if os.path.exists(done):
        return d
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d)
    t = pq.read_table(path, columns=["user_id", "ts", "event_id", "event_type"])
    ts_us = pc.divide(pc.cast(t.column("ts"), pa.int64()), 1000)
    idx = pc.sort_indices(
        pa.table({"us": ts_us, "eid": t.column("event_id")}),
        sort_keys=[("us", "ascending"), ("eid", "ascending")],
    )
    t = t.take(idx)
    n = t.num_rows
    for g in range(_PM_BUCKETS):
        lo = g * n // _PM_BUCKETS
        hi = (g + 1) * n // _PM_BUCKETS
        f = os.path.join(d, f"chunk_{g}.parquet")
        pq.write_table(t.slice(lo, hi - lo), f)
        os.utime(f, (mt + 10 * g, mt + 10 * g))
    open(done, "w").close()
    return d


def _track_pattern(key, pdfs: Iterable, state) -> Iterable:
    """Fold one micro-batch of a user's events into run-length state
    and emit the updated match stats (update-mode output).

    The pattern predicate fires at run-CLOSE time: when an event of a
    different type arrives, the open run is complete and maximal, so
    ``view``-run matches are decidable from (prev_t, closed run, new
    type) — the streaming form of the batch lag/lead adjacency test.
    The open tail run never fires (its successor is unknown), exactly
    like the batch composition's NULL lead().
    """
    import pandas as pd

    (user_id,) = key
    if state.exists:
        prev_t, cur_t, cur_len, cur_start, n_m, views, longest, first = (
            state.get
        )
    else:
        prev_t, cur_t, cur_len, cur_start = None, None, 0, 0
        n_m, views, longest, first = 0, 0, 0, -1

    chunks = [p for p in pdfs if not p.empty]
    if chunks:
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        order = sorted(
            zip(ts_us, pdf["event_id"], pdf["event_type"], strict=True)
        )
        for t_us, _eid, etype in order:
            t_us = int(t_us)
            if cur_t is None:
                cur_t, cur_len, cur_start = etype, 1, t_us
            elif etype == cur_t:
                cur_len += 1
            else:
                if cur_t == "view" and prev_t == "click" and etype == "purchase":
                    n_m += 1
                    views += cur_len
                    longest = max(longest, cur_len)
                    first = cur_start if first < 0 else min(first, cur_start)
                prev_t, cur_t, cur_len, cur_start = cur_t, etype, 1, t_us
        state.update(
            (prev_t, cur_t, cur_len, cur_start, n_m, views, longest, first)
        )
    if n_m > 0:
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_matches": [n_m],
                "views_matched": [views],
                "longest_view_run": [longest],
                "first_match_ts": [pd.Timestamp(first, unit="us")],
            }
        )


def run_pattern_stream(
    spark: SparkSession, staged: str, sink_dir: str, ckpt: str | None = None
) -> None:
    """Drain every staged chunk through the stateful pattern fold into
    a parquet sink dir (update-mode rows, one subdir per micro-batch).

    foreachBatch instead of the memory sink because the memory sink
    cannot recover from a checkpoint — and checkpoint recovery is the
    point: a later call with MORE files staged resumes the per-user
    run state where the last drain left it (the restart test's
    contract). Each batch's rows land by partition-scoped OVERWRITE
    keyed by batch id, so a replayed micro-batch rewrites an identical
    directory (the exactly-once upsert pattern, ingest/merge.py). The
    written frame is bdf-derived — no local createDataFrame inside an
    active micro-batch (the measured 5.3 s/batch trap)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = _cached_schema(spark, os.path.join(staged, "chunk_0.parquet"))
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    tracked = src.groupBy("user_id").applyInPandasWithState(
        _track_pattern,
        outputStructType=_PM_OUT_SCHEMA,
        stateStructType=_PM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def emit(bdf: DataFrame, batch_id: int) -> None:
        bdf.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"b{batch_id}")
        )

    w = (
        tracked.writeStream.foreachBatch(emit)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if ckpt:
        w = w.option("checkpointLocation", ckpt)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # state-store right-sizing (the stream family's measured lesson):
    # shuffle.partitions at first start = state-store count forever
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        w.start().awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def final_matches(spark: SparkSession, sink_dirs: list[str]) -> DataFrame:
    """Last emitted row per user across one or more drain sink dirs.
    n_matches is nondecreasing and every stat changes only when it
    does, so rows with the max n_matches per user are identical —
    max-row selection is deterministic."""
    from pyspark.sql import Window as W

    out = None
    for s in sink_dirs:
        t = spark.read.option("recursiveFileLookup", "true").parquet(s)
        out = t if out is None else out.unionByName(t)
    w = W.partitionBy("user_id").orderBy(F.col("n_matches").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select(
            "user_id",
            "n_matches",
            "views_matched",
            "longest_view_run",
            F.col("first_match_ts").cast("string").alias("first_match_start"),
        )
    )


def _pattern_oracle() -> str:
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _PATTERN_ORACLE,
    )

    return _PATTERN_ORACLE


@register("q_stream_pattern_match", oracle=_pattern_oracle())
def q_stream_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATCH_RECOGNIZE executed for real inside the gate: the
    events table arrives as 4 time-ordered micro-batches, per-user run
    state lives in applyInPandasWithState, matches fire at run-close
    time mid-stream, and the drained per-user stats must hash-equal the
    BATCH composition's oracle (the identical recursive-free RLE +
    adjacency SQL that verifies q_events_pattern_match) — the
    batch≡stream equality that makes the streaming operator's
    correctness a hash check rather than a hand-wave.

    Scale: O(1) state per user (two run descriptors + four counters),
    key-partitioned shuffle only, no corpus-global structure; the
    staged time-ordered arrival is the operator's stated input
    contract (see module docstring).

    Result lifetime: the returned DataFrame reads this invocation's
    run dir, which the NEXT invocation of this query in the same
    process reaps (_fresh_run_dir) — execute or materialize the result
    before re-invoking; holding two successive lazy results is not
    supported.
    """
    from end_to_end_aws_data_pipeline_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    staged = staged_time_dir(os.path.join(sf_dir, "events.parquet"))
    sink_dir = _fresh_run_dir(os.path.dirname(staged), "pattern_out")
    run_pattern_stream(spark, staged, sink_dir)
    return final_matches(spark, [sink_dir])


# ---------------------------------------------------------------------------
# scale path: JVM-side RLE pattern matching in foreachBatch
# ---------------------------------------------------------------------------

_RLE_STATE_SCHEMA = (
    "user_id long, prev_t string, open_t string, open_len long, "
    "open_start_us long, n_matches long, views_matched long, "
    "longest long, first_us long"
)


def _batch_runs(bdf: DataFrame) -> DataFrame:
    """Run-length encode one micro-batch per user, entirely JVM-side:
    the same chg-flag + running-sum composition as the batch operator,
    scoped to the batch's rows, plus each run's in-batch neighbours.

    Both event-sized window passes share ONE spec (user_id, ordered by
    us, event_id), so the running run-index sum reuses the change-flag
    pass's exchange and sort — the derived-row_number ordering the
    batch family also dropped cost a second full Sort of the batch per
    micro-batch (guide §2.4); event_id is unique so the total order and
    every downstream row are unchanged."""
    from pyspark.sql import Window as W

    from end_to_end_aws_data_pipeline_spark.catalog import normalize_event_ts

    ev = normalize_event_ts(bdf).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    wu = W.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.select(
        "user_id",
        "us",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(wu).eqNullSafe(F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    # ROWS frame pinned explicitly: the default RANGE frame treats
    # (us, event_id) ties as peers, and while event_id is unique in a
    # clean batch, an at-least-once replay can deliver duplicate rows —
    # RANGE would then merge runs that unique-row ordering keeps
    # distinct. ROWS keeps the same exchange + sort (same window spec),
    # so the plan shape is unchanged.
    runs = (
        flagged.withColumn(
            "idx",
            F.sum("chg").over(
                wu.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "idx")
        .agg(
            F.min("event_type").alias("etype"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("us").alias("run_start_us"),
        )
    )
    wk = W.partitionBy("user_id").orderBy("idx")
    return runs.select(
        "user_id",
        "idx",
        "etype",
        "run_len",
        "run_start_us",
        F.lag("etype").over(wk).alias("lag_t"),
        F.lead("etype").over(wk).alias("lead_t"),
    )


def run_pattern_stream_rle(
    spark: SparkSession,
    staged: str,
    store: str,
    ckpt: str | None = None,
    stop_after_batches: int | None = None,
    len_lo: int | None = None,
    len_hi: int | None = None,
    terminals: tuple[str, ...] = ("purchase",),
) -> None:
    """Drain the staged chunks through the JVM-RLE pattern fold.

    Each micro-batch: RLE the batch per user (windows + one aggregate,
    no Python in the row path), join the previous batch's state table,
    decide every run that CLOSES — in-batch runs via lag/lead, plus
    the stored open run closed by the batch's first run — and write
    the updated per-user state to ``store/b{batch_id}``. Keying the
    state snapshot by batch id makes the fold idempotent under replay:
    a redelivered batch re-reads its predecessor's snapshot and
    rewrites its own, byte-identical (the sketch stream's
    partition-scoped upsert discipline applied to carried state).

    State per user is one row; the snapshot is user-sized, never
    event-sized — and it is written BUCKETED (hash(user_id) %
    _RLE_STATE_BUCKETS, partitionBy'd) so the write is N parallel
    tasks, not one, and only the last _RLE_STATE_RETAIN snapshots are
    kept (availableNow replay needs exactly the predecessor; storage
    stays O(users), not O(batches x users)). A production deployment
    MERGEs into a keyed store per bucket instead of rewriting the
    snapshot; the per-batch read-modify-write here is the
    local-parquet stand-in, exactly like ingest/watermark.py's state
    table."""
    schema = _cached_schema(spark, os.path.join(staged, "chunk_0.parquet"))
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    seen = {"n": 0}
    # SPARK_GRAFT_STREAM_AUDIT=1: print per-batch fold wall time to
    # stderr so drain time decomposes into fold cost vs engine fixed
    # cost (trigger planning, source listing, WAL commits)
    _audit = bool(os.environ.get("SPARK_GRAFT_STREAM_AUDIT"))

    def upd(bdf: DataFrame, bid: int) -> None:
        import sys
        import time as _time

        _t0 = _time.time() if _audit else 0.0
        runs = _batch_runs(bdf)
        prev_path = os.path.join(store, f"b{bid - 1}")
        if bid > 0:
            if not os.path.isdir(prev_path):
                # the checkpoint proves batch bid-1 committed, so its
                # snapshot MUST exist — falling back to empty state
                # here would silently drop every carried run and
                # under-count matches (a checkpoint paired with the
                # wrong or cleaned store dir)
                raise RuntimeError(
                    f"pattern-RLE state store {store} is missing "
                    f"snapshot b{bid - 1} while the checkpoint resumes "
                    f"at batch {bid}: refusing to continue from empty "
                    "state — pair the checkpoint with its store dir, "
                    "or restart from a fresh checkpoint + store pair "
                    "(once the snapshot is retired it cannot be "
                    "recovered; SPARK_GRAFT_PATTERN_STATE_RETAIN only "
                    "helps preventively, raised before the drain)"
                )
            # explicit schema: an inferred read costs one extra
            # footer-sampling job per micro-batch (bucket is the
            # partition directory column; dropped after read)
            st = spark.read.schema(_RLE_STATE_SCHEMA + ", bucket int").parquet(
                prev_path
            ).drop("bucket")
        else:
            st = spark.createDataFrame([], _RLE_STATE_SCHEMA)
        j = runs.join(st, "user_id", "left")
        cont = (F.col("idx") == 1) & F.col("open_t").eqNullSafe(
            F.col("etype")
        )
        eff_len = F.when(
            cont, F.col("open_len") + F.col("run_len")
        ).otherwise(F.col("run_len"))
        eff_start = F.when(cont, F.col("open_start_us")).otherwise(
            F.col("run_start_us")
        )
        eff_prev = F.when(
            F.col("idx") == 1,
            F.when(cont, F.col("prev_t")).otherwise(F.col("open_t")),
        ).otherwise(F.col("lag_t"))
        # bounded quantifier view{lo,hi}: one more predicate on the
        # EFFECTIVE run length (batch-spanning runs accumulate into
        # eff_len / open_len before the test, so the bound applies to
        # the maximal run exactly as in the batch composition)
        def _qlen(col):
            if len_lo is None and len_hi is None:
                return F.lit(True)
            return col.between(
                len_lo if len_lo is not None else 1,
                len_hi if len_hi is not None else (1 << 62),
            )

        # alternation (B|C) over the closing symbol is an ALPHABET
        # predicate on the neighbour run's type — same compilation as
        # the batch composition, no new state or machinery
        run_match = (
            F.col("lead_t").isNotNull()
            & (F.col("etype") == "view")
            & (eff_prev == "click")
            & F.col("lead_t").isin(*terminals)
            & _qlen(eff_len)
        )
        # the stored open run, closed by the batch's first run
        boundary = (
            (F.col("idx") == 1)
            & ~cont
            & (F.col("open_t") == "view")
            & (F.col("prev_t") == "click")
            & F.col("etype").isin(*terminals)
            & _qlen(F.col("open_len"))
        )
        e = j.select(
            "user_id",
            "idx",
            "etype",
            eff_len.alias("eff_len"),
            eff_start.alias("eff_start"),
            eff_prev.alias("eff_prev"),
            run_match.alias("run_match"),
            boundary.alias("boundary"),
            "open_len",
            "open_start_us",
            "n_matches",
            "views_matched",
            "longest",
            "first_us",
        )
        m_len = F.when(F.col("run_match"), F.col("eff_len")).otherwise(
            F.when(F.col("boundary"), F.col("open_len"))
        )
        m_start = F.when(F.col("run_match"), F.col("eff_start")).otherwise(
            F.when(F.col("boundary"), F.col("open_start_us"))
        )
        upd_rows = e.groupBy("user_id").agg(
            (
                F.coalesce(F.first("n_matches", ignorenulls=True), F.lit(0))
                + F.sum(
                    F.col("run_match").cast("long")
                    + F.col("boundary").cast("long")
                )
            )
            .cast("long")
            .alias("n_matches"),
            (
                F.coalesce(
                    F.first("views_matched", ignorenulls=True), F.lit(0)
                )
                + F.coalesce(F.sum(m_len), F.lit(0))
            )
            .cast("long")
            .alias("views_matched"),
            F.greatest(
                F.coalesce(F.first("longest", ignorenulls=True), F.lit(0)),
                F.coalesce(F.max(m_len), F.lit(0)),
            )
            .cast("long")
            .alias("longest"),
            F.least(
                F.coalesce(
                    F.first("first_us", ignorenulls=True),
                    F.lit(None).cast("long"),
                ),
                F.min(m_start),
            ).alias("first_us_new"),
            F.max_by(
                F.struct(
                    F.col("eff_prev").alias("prev_t"),
                    F.col("etype").alias("open_t"),
                    F.col("eff_len").alias("open_len"),
                    F.col("eff_start").alias("open_start_us"),
                ),
                F.col("idx"),
            ).alias("tail"),
        )
        # least() is null-propagating only when BOTH sides are null —
        # semantics match min-of-known-values because least(NULL, x)=x
        new_rows = upd_rows.select(
            "user_id",
            F.col("tail.prev_t").alias("prev_t"),
            F.col("tail.open_t").alias("open_t"),
            F.col("tail.open_len").alias("open_len"),
            F.col("tail.open_start_us").alias("open_start_us"),
            "n_matches",
            "views_matched",
            "longest",
            F.col("first_us_new").alias("first_us"),
        )
        # carry state-only users by FULL OUTER merge instead of an
        # anti-join union: the union branch recomputed the whole RLE
        # window lineage a second time per batch (measured); here the
        # batch lineage is computed once and only the tiny state file
        # is read twice
        stc = st.select(
            "user_id", *(F.col(c).alias(f"s_{c}") for c in st.columns[1:])
        )
        merged = new_rows.join(stc, "user_id", "full").select(
            "user_id",
            *(
                F.coalesce(F.col(c), F.col(f"s_{c}")).alias(c)
                for c in new_rows.columns[1:]
            ),
        )
        # bucketed snapshot: hash(user_id) buckets, one task per bucket
        # (parallel write; a production store MERGEs per bucket) — the
        # coalesce(1) form was the one single-task serialization point
        # left at 100x users
        nb = _RLE_STATE_BUCKETS
        (
            merged.withColumn(
                "bucket", F.pmod(F.hash("user_id"), F.lit(nb))
            )
            .repartition(nb, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(store, f"b{bid}"))
        )
        # retire snapshots older than the replay horizon: keep the last
        # RETAIN batch snapshots, delete the rest (storage would
        # otherwise grow O(batches x users)); deletion happens only
        # after this batch's snapshot is fully written, so a replayed
        # batch always finds its predecessor
        for d in os.listdir(store):
            if (
                d.startswith("b")
                and d[1:].isdigit()
                and int(d[1:]) <= bid - _RLE_STATE_RETAIN
            ):
                shutil.rmtree(os.path.join(store, d), ignore_errors=True)
        seen["n"] += 1
        if _audit:
            print(
                f"[stream-audit] rle batch {bid}: "
                f"{_time.time() - _t0:.3f}s",
                file=sys.stderr,
            )
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
        import sys
        import time as _time

        _d0 = _time.time() if _audit else 0.0
        await_or_stop(w.start(), seen)
        if _audit:
            print(
                f"[stream-audit] rle drain total: "
                f"{_time.time() - _d0:.3f}s over {seen['n']} batches",
                file=sys.stderr,
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def rle_final_matches(spark: SparkSession, store: str) -> DataFrame:
    """Project the newest state snapshot into the oracle's shape."""
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
            f"pattern-RLE state store has no snapshots: {store} — the "
            "drain never ran, or this is not the store dir the stream "
            "wrote to"
        )
    last = max(snaps, key=lambda d: int(d[1:]))
    # inferred read is fine here (once per query, not per micro-batch);
    # drop the bucket partition column before projecting
    st = spark.read.parquet(os.path.join(store, last)).drop("bucket")
    return st.filter(F.col("n_matches") > 0).select(
        "user_id",
        "n_matches",
        "views_matched",
        F.col("longest").alias("longest_view_run"),
        F.timestamp_micros("first_us").cast("string").alias(
            "first_match_start"
        ),
    )


@register("q_stream_pattern_match_rle", oracle=_pattern_oracle())
def q_stream_pattern_match_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATCH_RECOGNIZE, scale path: the same time-ordered
    micro-batches and run-boundary state as q_stream_pattern_match,
    but the per-batch fold is pure JVM DataFrame algebra — RLE windows
    plus ONE aggregate per batch — with carried state in a
    batch-id-keyed user-sized snapshot instead of per-key GroupState.

    Why this exists next to the applyInPandasWithState form: the state
    API invokes Python once per key per micro-batch, which measured
    LINEAR in user count (18.2 s at sf0.1, 142 s at sf1 — ~80k pandas
    calls and climbing 10x per decade); this fold's cost is the
    batch's window shuffle, so it rides data volume, not key count —
    the same per-key-Python vs JVM split as the UDF ladder, applied to
    streaming state. Both forms hash against the IDENTICAL batch
    oracle, so their equivalence is driver-checked every round.

    Result lifetime: the returned DataFrame reads this invocation's
    store dir, which the NEXT invocation of this query in the same
    process reaps (_fresh_run_dir) — execute the result before
    re-invoking; holding two successive lazy results is not supported.
    """
    from end_to_end_aws_data_pipeline_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    staged = staged_time_dir(os.path.join(sf_dir, "events.parquet"))
    store = _fresh_run_dir(os.path.dirname(staged), "pattern_rle")
    run_pattern_stream_rle(spark, staged, store)
    return rle_final_matches(spark, store)


def _pattern_q_stream_oracle() -> str:
    """The quantified batch oracle, projected to the stream's shape:
    the stream emits only users with at least one accepted match and
    carries no rejected-candidate counter (that diagnostic is the
    batch form's)."""
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _PATTERN_Q_ORACLE,
    )

    return (
        "SELECT user_id, n_matches, views_matched, longest_view_run, "
        "first_match_start FROM (" + _PATTERN_Q_ORACLE + ") "
        "WHERE n_matches > 0"
    )


@register("q_stream_pattern_quantified", oracle=_pattern_q_stream_oracle())
def q_stream_pattern_quantified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming form of the quantified pattern ``click view{n,m}
    purchase`` (n=2, m=4 shared with q_events_pattern_quantified):
    the IDENTICAL JVM-RLE fold as q_stream_pattern_match_rle with the
    length bound passed down — batch-spanning view runs accumulate
    their effective length across micro-batches before the quantifier
    tests it, so a run split 3+2 across a batch boundary is correctly
    REJECTED at {2,4} while a 2+2 split is accepted. Hashes against
    the quantified batch oracle: the quantifier semantics are
    driver-checked equal in both forms every round.

    Result lifetime: execute the returned DataFrame before re-invoking
    this query in the same process — the next invocation reaps this
    one's store dir (_fresh_run_dir contract).
    """
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _PQ_HI,
        _PQ_LO,
    )
    from end_to_end_aws_data_pipeline_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    staged = staged_time_dir(os.path.join(sf_dir, "events.parquet"))
    store = _fresh_run_dir(os.path.dirname(staged), "pattern_q_rle")
    run_pattern_stream_rle(
        spark, staged, store, len_lo=_PQ_LO, len_hi=_PQ_HI
    )
    return rle_final_matches(spark, store)


def _pattern_alt_stream_oracle() -> str:
    """The alternation batch oracle, projected to the stream's shape:
    users with at least one accepted match, without the batch form's
    branch-breakdown and rejected-candidate diagnostics (the state
    fold tracks exactly the five published counters, so the stream
    stays schema-identical to the other stream pattern forms)."""
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _PATTERN_ALT_ORACLE,
    )

    return (
        "SELECT user_id, n_matches, views_matched, longest_view_run, "
        "first_match_start FROM (" + _PATTERN_ALT_ORACLE + ") "
        "WHERE n_matches > 0"
    )


@register("q_stream_pattern_alternation", oracle=_pattern_alt_stream_oracle())
def q_stream_pattern_alternation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming form of the alternation pattern ``click view{n,m}
    (purchase|signup)`` (bounds and alphabet shared with
    q_events_pattern_alternation): the IDENTICAL JVM-RLE fold as the
    quantified stream with the terminal ALPHABET passed down — both
    the in-batch closing neighbour and the state-carried open run
    close on any symbol of the alternation, so a view run split
    across a batch boundary and closed by a 'signup' is accepted
    exactly as the batch composition accepts it. Hashes against the
    alternation batch oracle: symbol-alternation semantics are
    driver-checked equal in both forms every round.

    Result lifetime: execute the returned DataFrame before re-invoking
    this query in the same process — the next invocation reaps this
    one's store dir (_fresh_run_dir contract).
    """
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _PA_ALTS,
        _PQ_HI,
        _PQ_LO,
    )
    from end_to_end_aws_data_pipeline_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    staged = staged_time_dir(os.path.join(sf_dir, "events.parquet"))
    store = _fresh_run_dir(os.path.dirname(staged), "pattern_a_rle")
    run_pattern_stream_rle(
        spark,
        staged,
        store,
        len_lo=_PQ_LO,
        len_hi=_PQ_HI,
        terminals=_PA_ALTS,
    )
    return rle_final_matches(spark, store)
