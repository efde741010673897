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
