"""Properties of the sweep-line concurrency and basket-affinity ops."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.operators.sweep import (
    q_basket_affinity,
    q_interval_concurrency,
)
from tests.conftest import SF_SMOKE


def test_concurrency_bounds(spark):
    """Peak concurrency is ≥1 on active days and ≤ #distinct users
    (a user's gap-based sessions can never self-overlap)."""
    out = q_interval_concurrency(spark, SF_SMOKE).collect()
    assert out, "no days produced"
    n_users = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in out:
        assert 1 <= r["max_concurrent"] <= n_users
        assert r["n_points"] >= 1


def test_segmented_prefix_sum_equals_global_window(spark):
    """The day-segmented two-level prefix sum must reproduce the naive
    single-partition global running sum exactly (same curve, same
    per-day max) — the whole point of the pattern is that only the
    execution shape changes."""
    df = q_interval_concurrency(spark, SF_SMOKE)
    # naive mirror: one global window, tolerable at smoke scale
    e = table(spark, SF_SMOKE, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = (
        e.withColumn(
            "ns", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "sid",
            F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    pts = sess.select(
        F.col("s").alias("ts"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        sess.select(F.col("e").alias("ts"), F.lit(-1).alias("delta"), "user_id")
    )
    naive = (
        pts.withColumn(
            "conc",
            F.sum("delta").over(
                W.orderBy("ts", F.col("delta").desc(), "user_id").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        )
        .groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(F.max("conc").cast("long").alias("max_concurrent"))
    )
    got = {r["day"]: r["max_concurrent"] for r in df.collect()}
    want = {r["day"]: r["max_concurrent"] for r in naive.collect()}
    assert got == want


def test_basket_affinity_invariants(spark):
    """pair_count ≤ min(cnt_a, cnt_b); confidences are exact ppm in
    (0, 1e6]; pairs are canonically ordered part_a < part_b."""
    rows = q_basket_affinity(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["pair_count"] <= min(r["cnt_a"], r["cnt_b"])
        assert 0 < r["conf_ab_ppm"] <= 1_000_000
        assert 0 < r["conf_ba_ppm"] <= 1_000_000
        assert r["conf_ab_ppm"] == r["pair_count"] * 1_000_000 // r["cnt_a"]


def test_stl_decomposition_reconstructs_counts(spark):
    """trend + seasonal + residual must reconstruct the daily count
    (to publish-rounding resolution), per-dow residuals must mean to
    ~0 (the seasonal mean was subtracted), and only complete 7-day
    windows may publish."""
    from collections import defaultdict

    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_timeseries_stl_dow,
    )
    from tests.conftest import SF_SMOKE

    rows = q_timeseries_stl_dow(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    by_dow = defaultdict(list)
    for r in rows:
        assert abs((r.trend + r.seasonal + r.residual) - r.cnt) < 3e-6, r
        assert 0 <= r.dow <= 6
        by_dow[r.dow].append(r.residual)
    for dow, res in by_dow.items():
        assert abs(sum(res) / len(res)) < 2e-6, (dow, res)


def test_compaction_plan_conserves_and_orders(spark):
    """The compaction manifest must conserve rows and input files,
    assign contiguous bins, and cover non-overlapping ordered day
    ranges — the invariants that make the plan safe to execute."""
    from end_to_end_aws_data_pipeline_spark.catalog import table
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _COMPACT_TARGET,
        q_etl_compaction_plan,
    )
    from tests.conftest import SF_SMOKE

    bins = sorted(
        q_etl_compaction_plan(spark, SF_SMOKE).collect(),
        key=lambda r: r.file_bin,
    )
    o = table(spark, SF_SMOKE, "orders")
    total_rows = o.count()
    n_days = o.select("o_orderdate").distinct().count()
    assert [b.file_bin for b in bins] == list(range(len(bins)))
    assert sum(b.rows_out for b in bins) == total_rows
    assert sum(b.n_files for b in bins) == n_days
    for a, b in zip(bins, bins[1:]):
        assert a.last_day < b.first_day  # non-overlapping, ordered
    # exclusive-prefix binning: a bin stops growing only once the
    # running total has crossed its boundary, so every bin except the
    # last must end at-or-past its boundary minus one input file
    running = 0
    for b in bins[:-1]:
        running += b.rows_out
        assert running >= (b.file_bin + 1) * _COMPACT_TARGET


def test_ks_drift_matches_brute_force(spark):
    """d_num must equal the brute-force two-sample KS numerator
    (max over quantized values of |cum1·n2 − cum2·n1|) computed
    independently in Python, and the integer drift verdict must agree
    with the float α=0.05 formula D > 1.358·√((n1+n2)/(n1·n2))."""
    import math
    from collections import defaultdict

    from end_to_end_aws_data_pipeline_spark.catalog import table
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _KS_SPLIT_DAY,
        q_etl_ks_drift,
    )
    from tests.conftest import SF_SMOKE

    got = {r.event_type: r for r in q_etl_ks_drift(spark, SF_SMOKE).collect()}

    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in table(spark, SF_SMOKE, "events").collect():
        cents = math.floor(r.value * 100 + 0.5)
        per[r.event_type][cents][0 if r.ts.day < _KS_SPLIT_DAY else 1] += 1
    assert set(per) == set(got)
    for et, counts in per.items():
        n1 = sum(v[0] for v in counts.values())
        n2 = sum(v[1] for v in counts.values())
        cum1 = cum2 = 0
        d_num = 0
        for c in sorted(counts):
            cum1 += counts[c][0]
            cum2 += counts[c][1]
            d_num = max(d_num, abs(cum1 * n2 - cum2 * n1))
        r = got[et]
        assert (r.n1, r.n2, r.d_num) == (n1, n2, d_num), et
        d = d_num / (n1 * n2)
        assert r.drifted == (d > 1.358 * math.sqrt((n1 + n2) / (n1 * n2))), et


def test_holt_degenerate_series_returns_empty(spark, tmp_path):
    """A series with <2 distinct days has no definable trend: the
    operator must mirror the oracle's graceful empty result (the
    recursive CTE's anchor needs rows t=1 AND t=2) instead of crashing
    with IndexError on ys[1] (round-9 ADVICE item)."""
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_timeseries_holt,
    )

    sf_dir = str(tmp_path / "sf_degenerate")
    spark.createDataFrame(
        [("1995-01-01", 10.0), ("1995-01-01", 20.0)],
        "l_shipdate string, l_extendedprice double",
    ).write.parquet(f"{sf_dir}/lineitem.parquet")

    out = q_timeseries_holt(spark, sf_dir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "t", "day", "y_c", "fitted_c", "resid_c", "level_c", "trend_c",
    ]

    # exactly 2 distinct days → exactly one published step, no crash
    sf_dir2 = str(tmp_path / "sf_two_days")
    spark.createDataFrame(
        [("1995-01-01", 10.0), ("1995-01-02", 30.0)],
        "l_shipdate string, l_extendedprice double",
    ).write.parquet(f"{sf_dir2}/lineitem.parquet")
    rows = q_timeseries_holt(spark, sf_dir2).collect()
    assert len(rows) == 1 and rows[0]["t"] == 2


def test_holt_bykey_single_key_equals_global(spark, tmp_path):
    """On a corpus whose suppliers all live in ONE nation, the per-key
    applyInPandas form must reproduce the driver recursion exactly
    (both paths call _holt_steps — this pins the plumbing around it:
    grouping, day ordering, column mapping)."""
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_timeseries_holt,
        q_timeseries_holt_bykey,
    )

    sf_dir = str(tmp_path / "sf_onekey")
    rows = [
        (f"1995-01-{d:02d}", float(100 + 13 * d % 47), 1 + d % 3)
        for d in range(1, 29)
        for _ in range(2)
    ]
    spark.createDataFrame(
        rows, "l_shipdate string, l_extendedprice double, l_suppkey int"
    ).write.parquet(f"{sf_dir}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "s_suppkey int, s_nationkey int"
    ).write.parquet(f"{sf_dir}/supplier.parquet")
    spark.createDataFrame(
        [(7, "FRANCE")], "n_nationkey int, n_name string"
    ).write.parquet(f"{sf_dir}/nation.parquet")

    got = {
        r["t"]: r
        for r in q_timeseries_holt_bykey(spark, sf_dir).collect()
    }
    want = q_timeseries_holt(spark, sf_dir).collect()
    assert len(want) == 27 and len(got) == 27
    for w in want:
        g = got[w["t"]]
        assert g["nation"] == "FRANCE"
        for c in ("day", "y_c", "fitted_c", "resid_c", "level_c", "trend_c"):
            assert g[c] == w[c], (w["t"], c)


def test_holt_winters_guard_and_first_step(spark, tmp_path):
    """Below two full seasons the operator publishes nothing (matching
    the oracle's anchor guard); at exactly two weeks it publishes
    t=8..14 and the first step's arithmetic is hand-checkable from the
    deterministic initialization."""
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _hw_steps,
        _tdiv,
        q_timeseries_holt_winters,
    )

    # 13 days -> empty
    sf_a = str(tmp_path / "sf13")
    rows = [(f"1995-01-{d:02d}", float(d)) for d in range(1, 14)]
    spark.createDataFrame(
        rows, "l_shipdate string, l_extendedprice double"
    ).write.parquet(f"{sf_a}/lineitem.parquet")
    assert q_timeseries_holt_winters(spark, sf_a).count() == 0

    # 14 days -> 7 published steps, t = 8..14
    sf_b = str(tmp_path / "sf14")
    rows = [(f"1995-01-{d:02d}", float(10 * d)) for d in range(1, 15)]
    spark.createDataFrame(
        rows, "l_shipdate string, l_extendedprice double"
    ).write.parquet(f"{sf_b}/lineitem.parquet")
    got = {r["t"]: r for r in q_timeseries_holt_winters(spark, sf_b).collect()}
    assert sorted(got) == list(range(8, 15))

    ys = [1000 * d for d in range(1, 15)]
    l0 = _tdiv(sum(ys[:7]), 7)          # 4000
    b0 = _tdiv(_tdiv(sum(ys[7:14]), 7) - l0, 7)  # (11000-4000)//7 = 1000
    s1 = ys[0] - l0                     # -3000
    fitted8 = l0 + b0 + s1
    assert got[8]["fitted_c"] == fitted8
    assert got[8]["y_c"] == 8000
    nl = _tdiv(3 * (8000 - s1) + 7 * (l0 + b0), 10)
    assert got[8]["level_c"] == nl
    assert got[8]["seasonal_c"] == _tdiv(2 * (8000 - nl) + 8 * s1, 10)

    # pure-Python helper agrees with the published frame end-to-end
    assert len(_hw_steps(ys)) == 7
