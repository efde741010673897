"""The as-of join is this engine's main from-scratch operator —
property-check it against a direct Python reference model."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_aws_data_pipeline_spark.operators.asof import asof_join

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

lefts = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=0, max_size=10
)
rights = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 99)),
    min_size=0,
    max_size=10,
)


def _model(left, right):
    """Reference: greatest right ts ≤ left ts per key (unique per key/ts)."""
    out = {}
    for i, (k, lt) in enumerate(left):
        best = None
        for rk, rt, rv in right:
            if rk == k and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        out[i] = best
    return out


@given(left=lefts, right=rights)
@_SLOW
def test_asof_join_matches_model(spark, left, right):
    right_u = list({(k, t): (k, t, v) for k, t, v in right}.values())
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    ldf = (
        spark.createDataFrame(left_rows, "row_id int, k int, ts int")
        if left_rows
        else spark.createDataFrame([], "row_id int, k int, ts int")
    )
    rdf = (
        spark.createDataFrame(right_u, "k int, rts int, rv int")
        if right_u
        else spark.createDataFrame([], "k int, rts int, rv int")
    )
    got = {
        r.row_id: (r.rts, r.rv) if r.rts is not None else None
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts", value_cols=["rts", "rv"]
        ).collect()
    }
    assert got == _model(left, right_u)


def test_asof_join_multi_key(spark):
    ldf = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 10)], "row_id int, grp string, ts int"
    )
    rdf = spark.createDataFrame(
        [("x", 5, 100), ("y", 7, 200), ("x", 11, 300)], "grp string, rts int, rv int"
    )
    out = {
        r.row_id: r.rv
        for r in asof_join(
            ldf, rdf, on=["grp"], left_ts="ts", right_ts="rts", value_cols=["rv"]
        ).collect()
    }
    assert out == {1: 100, 2: 200}  # x@11 is later than left ts → excluded


def test_gapfill_interpolation_properties(spark):
    """Gap-fill invariants: the spine is dense per user (consecutive
    hours), non-gap rows reproduce observed values, and every
    interpolated value lies between its bracketing observations
    (affine fill can't overshoot)."""
    from end_to_end_aws_data_pipeline_spark.operators.asof import (
        q_timeseries_gapfill,
    )
    from tests.conftest import SF_SMOKE

    rows = q_timeseries_gapfill(spark, SF_SMOKE).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for series in by_user.values():
        series.sort(key=lambda r: r.h)
        for a, b in zip(series, series[1:]):
            assert (b.h - a.h).total_seconds() == 3600  # dense hourly
        assert not series[0].was_gap and not series[-1].was_gap
        obs = [(i, r.value_interp) for i, r in enumerate(series) if not r.was_gap]
        for (i1, v1), (i2, v2) in zip(obs, obs[1:]):
            lo, hi = min(v1, v2), max(v1, v2)
            for j in range(i1 + 1, i2):
                assert lo - 1e-6 <= series[j].value_interp <= hi + 1e-6


def test_asof_tolerance_matches_pandas_merge_asof(spark):
    """q_asof_tolerance must reproduce pd.merge_asof backward AND
    forward with tolerance=30min on the same events — the reference
    implementation of the semantics it claims."""
    import pandas as pd

    from end_to_end_aws_data_pipeline_spark.operators.asof import (
        q_asof_tolerance,
    )
    from tests.conftest import SF_SMOKE

    got = {
        r.event_id: (
            r.prev_click_ts,
            r.prev_click_value,
            r.next_click_ts,
            r.next_click_value,
        )
        for r in q_asof_tolerance(spark, SF_SMOKE).collect()
    }

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev["ts"] = pd.to_datetime(ev["ts"])
    clicks = (
        ev[ev.event_type == "click"]
        .groupby(["user_id", "ts"], as_index=False)
        .agg(cval=("value", "max"))
        .rename(columns={"ts": "cts"})
        .sort_values("cts")
    )
    purchases = ev[ev.event_type == "purchase"][
        ["event_id", "user_id", "ts"]
    ].sort_values("ts")
    tol = pd.Timedelta(minutes=30)
    back = pd.merge_asof(
        purchases,
        clicks,
        left_on="ts",
        right_on="cts",
        by="user_id",
        direction="backward",
        tolerance=tol,
    )
    fwd = pd.merge_asof(
        purchases,
        clicks,
        left_on="ts",
        right_on="cts",
        by="user_id",
        direction="forward",
        tolerance=tol,
    )
    assert len(got) == len(purchases)
    merged = back.merge(
        fwd, on=["event_id", "user_id", "ts"], suffixes=("_b", "_f")
    )
    for row in merged.itertuples():
        g = got[row.event_id]
        exp = (
            None if pd.isna(row.cts_b) else row.cts_b.to_pydatetime(),
            None if pd.isna(row.cval_b) else row.cval_b,
            None if pd.isna(row.cts_f) else row.cts_f.to_pydatetime(),
            None if pd.isna(row.cval_f) else row.cval_f,
        )
        assert g == exp, (row.event_id, g, exp)
