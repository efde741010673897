"""Invariants for the round-6 fifth wave: Benford, Pareto skyline,
k-hop BFS, PMI collocations — each checked against an independent
driver-side recomputation at smoke scale (the oracle already checks
cross-engine hashes; these pin the *semantics*)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.operators.extras import (
    _BENFORD_PPM,
    q_etl_benford,
)
from end_to_end_aws_data_pipeline_spark.operators.graph import q_graph_khop
from end_to_end_aws_data_pipeline_spark.operators.text import (
    q_text_collocations,
)
from end_to_end_aws_data_pipeline_spark.operators.windows import (
    q_window_pareto_skyline,
)
from tests.conftest import SF_SMOKE


def test_benford_histogram_partitions_orders(spark):
    rows = q_etl_benford(spark, SF_SMOKE).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    n_orders = (
        table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .count()
    )
    assert sum(r["cnt"] for r in rows) == n_orders
    for r in rows:
        assert r["expected_ppm"] == _BENFORD_PPM[r["digit"]]
        assert r["dev_ppm"] == abs(r["observed_ppm"] - r["expected_ppm"])
    # observed ppm sums to ~1e6 (floor division loses < 9 ppm)
    s = sum(r["observed_ppm"] for r in rows)
    assert 1_000_000 - 9 <= s <= 1_000_000


def test_pareto_skyline_is_exactly_the_undominated_set(spark):
    """Brute-force O(n²) dominance per brand at smoke scale must equal
    the segmented-scan result."""
    parts = (
        table(spark, SF_SMOKE, "part")
        .select(
            "p_brand",
            "p_partkey",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
            F.col("p_size").cast("long").alias("size"),
        )
        .collect()
    )
    by_brand = defaultdict(list)
    for r in parts:
        by_brand[r["p_brand"]].append(r)
    want = set()
    for brand, rows in by_brand.items():
        for r in rows:
            dominated = any(
                o["cents"] <= r["cents"]
                and o["size"] >= r["size"]
                and (o["cents"] < r["cents"] or o["size"] > r["size"])
                for o in rows
            )
            if not dominated:
                want.add((brand, r["p_partkey"]))
    got = {
        (r["p_brand"], r["p_partkey"])
        for r in q_window_pareto_skyline(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_khop_matches_python_bfs(spark):
    """Driver-side BFS over the collected edge list reproduces every
    hop's count and checksum."""
    o = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey")
    fwd = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .collect()
    )
    adj = defaultdict(set)
    for r in fwd:
        adj[r["src"]].add(r["dst"])
        adj[r["dst"]].add(r["src"])
    seeds = {n for n in adj if n % 2 == 0 and (n // 2) % 97 == 0}
    visited, frontier = set(seeds), set(seeds)
    expect = {0: (len(seeds), sum(seeds))}
    for hop in (1, 2, 3):
        nxt = {d for n in frontier for d in adj[n]} - visited
        if nxt:
            expect[hop] = (len(nxt), sum(nxt))
        visited |= nxt
        frontier = nxt
    got = {
        r["hop"]: (r["n_reached"], r["key_checksum"])
        for r in q_graph_khop(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_collocations_pmi_monotone_in_pair_count(spark):
    """Published PMI must equal the fixed-point formula recomputed from
    the published counts, given corpus token total N."""
    rows = q_text_collocations(spark, SF_SMOKE).collect()
    assert rows and len(rows) <= 25
    d = table(spark, SF_SMOKE, "documents")
    n = d.select(F.explode(F.split("text", " ")).alias("w")).count()

    def l2fp(x: int) -> int:
        e = x.bit_length() - 1
        return 16 * e + x * 16 // (1 << e) - 16

    for r in rows:
        assert r["pair_count"] >= 5
        want = (
            l2fp(r["pair_count"])
            + l2fp(n)
            - l2fp(r["cnt_a"])
            - l2fp(r["cnt_b"])
        )
        assert r["pmi_fp"] == want


def test_rolling_distinct_matches_driver_recompute(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_window_rolling_distinct,
    )

    du = (
        table(spark, SF_SMOKE, "events")
        .select(F.col("ts").cast("date").cast("string").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    import datetime as dt

    pairs = {(dt.date.fromisoformat(r["day"]), r["user_id"]) for r in du}
    days = sorted({d for d, _ in pairs})
    want = {
        str(d): len(
            {u for (e, u) in pairs if 0 <= (d - e).days <= 6}
        )
        for d in days
    }
    got = {
        r["day"]: r["n_active_7d"]
        for r in q_window_rolling_distinct(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_global_decile_bins_are_equi_depth_and_ordered(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_window_global_decile,
    )

    rows = sorted(
        q_window_global_decile(spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    n = sum(r["n_orders"] for r in rows)
    assert n == table(spark, SF_SMOKE, "orders").count()
    # equal population within 1 (floor-division binning)
    sizes = [r["n_orders"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # value ranges strictly ordered across bins (ties broken by key
    # stay inside one bin boundary pair)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_cents"] <= hi["min_cents"]


def test_robust_stats_match_driver_recompute(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_agg_robust_stats,
    )

    cents = sorted(
        r["c"]
        for r in table(spark, SF_SMOKE, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    median = cents[(n + 1) // 2 - 1]  # lower median, 1-based rank (n+1)//2
    devs = sorted(abs(c - median) for c in cents)
    mad = devs[(n + 1) // 2 - 1]
    k = n * 5 // 100
    kept = cents[k : n - k]
    row = q_agg_robust_stats(spark, SF_SMOKE).collect()[0]
    assert row["median_cents"] == median
    assert row["mad_cents"] == mad
    assert row["n_kept"] == len(kept)
    assert row["sum_cents"] == sum(kept)
    assert row["trimmed_mean_centi"] == sum(kept) * 100 // len(kept)


def test_weighted_median_matches_driver_recompute(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_agg_weighted_median,
    )

    rows = (
        table(spark, SF_SMOKE, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .collect()
    )
    items = sorted((r["c"], r["w"]) for r in rows)
    tw = sum(w for _, w in items)
    thr = (tw + 1) // 2
    cw = 0
    for c, w in items:
        cw += w
        if cw >= thr:
            want = c
            break
    got = q_agg_weighted_median(spark, SF_SMOKE).collect()
    assert len(got) == 1
    assert got[0]["weighted_median_cents"] == want
    assert got[0]["total_weight"] == tw


def test_psi_drift_shares_sum_to_million(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_etl_psi_drift,
    )

    rows = q_etl_psi_drift(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 10
    for col in ("pa_ppm", "pb_ppm"):
        s = sum(r[col] for r in rows)
        assert 1_000_000 - len(rows) <= s <= 1_000_000
    for r in rows:
        # contribution sign: positive iff shares moved apart in the
        # same direction as the log ratio
        if r["pa_ppm"] == r["pb_ppm"]:
            assert r["psi_contrib_fp"] == 0
        else:
            assert r["psi_contrib_fp"] >= 0  # (pa-pb) and L(pa)-L(pb) co-signed


def test_changepoint_is_argmax_of_driver_cusum(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_timeseries_changepoint,
    )

    daily = (
        table(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
        )
        .collect()
    )
    series = sorted((r["day"], r["x"]) for r in daily)
    k, s = len(series), sum(x for _, x in series)
    c, best = 0, None
    for day, x in series:
        c += x * k - s
        if best is None or abs(c) > best[1] or (abs(c) == best[1] and day < best[0]):
            best = (day, abs(c))
    got = q_timeseries_changepoint(spark, SF_SMOKE).collect()[0]
    assert (got["change_day"], got["abs_cusum_scaled"]) == best


def test_skew_profile_uniform_bound(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_etl_skew_profile,
    )

    rows = q_etl_skew_profile(spark, SF_SMOKE).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_distinct"] <= r["n_rows"]
        assert r["max_freq"] * r["n_distinct"] >= r["n_rows"]  # pigeonhole
        # ratio >= ~1e6 by pigeonhole (integer division can shave <1 ppm-unit)
        assert r["skew_ratio_ppm"] >= 999_999


def test_pps_sample_properties(spark):
    """Systematic PPS: exactly k selection points land; multiplicities
    sum to k; every multi-hit row has weight > W/k; matches a
    driver-side replay of the same grid."""
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _PPS_K,
        q_sample_weighted_pps,
    )

    li = sorted(
        (
            (r["l_orderkey"], r["l_linenumber"], int(r["l_quantity"]))
            for r in table(spark, SF_SMOKE, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity")
            .collect()
        )
    )
    tw = sum(w for _, _, w in li)
    pts = [(2 * t + 1) * tw // (2 * _PPS_K) for t in range(_PPS_K)]
    want = {}
    cw = 0
    it = iter(pts)
    nxt = next(it, None)
    for ok_, ln, w in li:
        cw += w
        while nxt is not None and nxt < cw:
            # point fell in [cw-w, cw)
            key = (ok_, ln)
            want[key] = want.get(key, 0) + 1
            nxt = next(it, None)
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["multiplicity"]
        for r in q_sample_weighted_pps(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert sum(got.values()) == _PPS_K


def test_hard_negatives_labels_differ_and_beat_random(spark):
    from end_to_end_aws_data_pipeline_spark.operators.similarity import (
        q_embed_hard_negatives,
    )

    rows = q_embed_hard_negatives(spark, SF_SMOKE).collect()
    assert rows
    e = {
        r["vec_id"]: r["label"]
        for r in table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    by_q = defaultdict(list)
    for r in rows:
        assert e[r["neighbor_id"]] == r["neg_label"]
        assert r["neg_label"] != e[r["query_id"]], "negative shares the label"
        by_q[r["query_id"]].append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_funnel_latency_matches_driver_recompute(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_funnel_latency,
    )

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", F.unix_timestamp("ts").alias("s"))
        .collect()
    )
    first = defaultdict(lambda: [None, None])
    for r in ev:
        if r["event_type"] == "view":
            cur = first[r["user_id"]][0]
            first[r["user_id"]][0] = r["s"] if cur is None else min(cur, r["s"])
        elif r["event_type"] == "purchase":
            cur = first[r["user_id"]][1]
            first[r["user_id"]][1] = r["s"] if cur is None else min(cur, r["s"])
    lats = sorted(
        b - v for v, b in first.values() if v is not None and b is not None and b >= v
    )
    n = len(lats)
    got = q_funnel_latency(spark, SF_SMOKE).collect()[0]
    assert got["n_converted"] == n
    assert got["median_latency_s"] == lats[(n + 1) // 2 - 1]
    assert got["p90_latency_s"] == lats[(n * 9 + 9) // 10 - 1]


def test_rolling_hll_tracks_exact_within_rsd(spark):
    """The 7-day HLL estimate stays within ~4 standard errors of the
    exact rolling distinct on every day (m=256 → se ≈ 6.5%)."""
    from end_to_end_aws_data_pipeline_spark.operators.percentiles import (
        q_window_rolling_hll,
    )

    rows = q_window_rolling_hll(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        exact = r["exact_users_7d"]
        est = r["hll_users_7d"]
        assert exact > 0
        assert abs(est - exact) / exact < 0.26, (r["day"], exact, est)


def test_merkle_diff_finds_exactly_the_drift(spark):
    """Every injected drift key (dropped %1009, repriced %997) lands in
    a reported divergent bucket, and per-bucket missing/changed counts
    equal the construction."""
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        _MERKLE_BUCKET,
        q_etl_merkle_diff,
    )

    keys = [
        r["o_orderkey"]
        for r in table(spark, SF_SMOKE, "orders").select("o_orderkey").collect()
    ]
    want_missing = defaultdict(int)
    want_changed = defaultdict(int)
    for k in keys:
        if k % 1009 == 0:
            want_missing[k // _MERKLE_BUCKET] += 1
        elif k % 997 == 0:
            want_changed[k // _MERKLE_BUCKET] += 1
    rows = q_etl_merkle_diff(spark, SF_SMOKE).collect()
    got_missing = {r["bucket"]: r["n_missing"] for r in rows}
    got_changed = {r["bucket"]: r["n_changed"] for r in rows}
    want_buckets = {b for b, v in {**want_missing, **want_changed}.items() if v}
    assert set(got_missing) == want_buckets
    for b in want_buckets:
        assert got_missing[b] == want_missing.get(b, 0)
        assert got_changed[b] == want_changed.get(b, 0)


def test_top_paths_counts_match_driver_trigram_scan(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_events_top_paths,
    )

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            counts[" > ".join(types[i : i + 3])] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = sorted(
        ((r["path"], r["n"]) for r in q_events_top_paths(spark, SF_SMOKE).collect()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == want


def test_zorder_buckets_partition_rows_with_bounded_boxes(spark):
    from end_to_end_aws_data_pipeline_spark.operators.sweep import (
        q_etl_zorder_stats,
    )

    rows = q_etl_zorder_stats(spark, SF_SMOKE).collect()
    n = sum(r["n_rows"] for r in rows)
    assert n == table(spark, SF_SMOKE, "orders").count()
    total_area = 256 * 256
    for r in rows:
        assert 0 <= r["x_min"] <= r["x_max"] <= 255
        assert 0 <= r["y_min"] <= r["y_max"] <= 255
        assert r["bbox_area"] == (r["x_max"] - r["x_min"] + 1) * (
            r["y_max"] - r["y_min"] + 1
        )
        # the whole point: every curve bucket's box is a real subset of
        # the plane (a linear sort's y-range would be the full 256)
        assert r["bbox_area"] < total_area


def test_stream_dedup_equals_batch_distinct(spark):
    from end_to_end_aws_data_pipeline_spark.streaming.queries import (
        q_stream_dedup_watermarked,
    )

    got = {
        r["event_type"]: (r["n_unique"], r["id_checksum"])
        for r in q_stream_dedup_watermarked(spark, SF_SMOKE).collect()
    }
    want_rows = (
        table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("ck"),
        )
        .collect()
    )
    want = {r["event_type"]: (r["n"], r["ck"]) for r in want_rows}
    assert got == want


def test_attribution_markov_semantics(spark, tmp_path):
    """Hand-built corpus where the model's answer is knowable: every
    conversion goes through 'click'; 'view' only appears on a
    non-converting journey. Removing click must kill ALL conversion
    (removal effect = R0, full credit); removing view must change
    nothing (removal effect 0, credit 0)."""
    from end_to_end_aws_data_pipeline_spark.operators.extras import (
        _RMV_R0,
        q_attribution_markov,
    )

    sf_dir = str(tmp_path / "sf_attr")
    rows = [
        # user 1: click -> purchase  (converts via click)
        (1, "2020-01-01 10:00:00", 1, "click"),
        (1, "2020-01-01 10:01:00", 2, "purchase"),
        # user 2: view -> end        (never converts)
        (2, "2020-01-01 11:00:00", 3, "view"),
    ]
    spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, event_type string"
    ).selectExpr(
        "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id", "event_type"
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {r["channel"]: r for r in q_attribution_markov(spark, sf_dir).collect()}
    assert set(got) == {"click", "view"}
    assert got["click"]["conv_removed_fp"] == 0
    assert got["click"]["removal_fp"] == _RMV_R0
    assert got["click"]["credit_fp"] == _RMV_R0
    assert got["view"]["removal_fp"] == 0
    assert got["view"]["credit_fp"] == 0
    # two journeys -> two START edges (click, view), 1/2 each; click
    # converts with prob 1 -> full-chain conversion = 1/2 exactly
    assert got["click"]["conv_full_fp"] == _RMV_R0 // 2
