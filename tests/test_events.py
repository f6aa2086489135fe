"""Event-stream analytics (operators/events.py): Markov transitions,
ordered funnel conversion, JSON-property aggregation."""

from __future__ import annotations

import datetime

import pytest

from bm25_pagerank_rpi_spark.operators import events as ev_mod


def _ev(spark, rows):
    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (i, t0 + datetime.timedelta(seconds=sec), uid, et, 1.0, props)
        for i, (sec, uid, et, props) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_transitions_counts_and_probs(spark):
    rows = [
        (0, 1, "view", "{}"),
        (1, 1, "click", "{}"),
        (2, 1, "view", "{}"),
        (3, 1, "click", "{}"),
        (0, 2, "view", "{}"),
        (1, 2, "error", "{}"),
        # user 3: single event -> no transition
        (0, 3, "signup", "{}"),
    ]
    got = {
        (r.prev_type, r.event_type): r
        for r in ev_mod.event_transitions(_ev(spark, rows)).collect()
    }
    assert got[("view", "click")].n == 2
    assert got[("click", "view")].n == 1
    assert got[("view", "error")].n == 1
    assert ("signup", "view") not in got
    # rows of the matrix sum to 1
    assert abs(got[("view", "click")].prob - 2 / 3) < 1e-12
    assert abs(got[("view", "error")].prob - 1 / 3) < 1e-12
    assert got[("click", "view")].prob == 1.0


def test_funnel_order_matters(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        (0, 1, "view", "{}"),
        (10, 1, "click", "{}"),
        (20, 1, "purchase", "{}"),
        # user 2 clicks BEFORE viewing: reaches step 1 only
        (5, 2, "click", "{}"),
        (6, 2, "view", "{}"),
        # user 3 views then purchases without clicking: stops at step 1
        (0, 3, "view", "{}"),
        (9, 3, "purchase", "{}"),
        # user 4 never views
        (0, 4, "purchase", "{}"),
    ]
    got = {
        r.step: r
        for r in ev_mod.funnel_conversion(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got[1].users == 3  # users 1, 2, 3
    assert got[2].users == 1  # only user 1 clicked after viewing
    assert got[3].users == 1
    assert abs(got[2].rate - 1 / 3) < 1e-12
    assert got[1].rate == 1.0


def test_funnel_validates_and_empty_first_step(spark):
    with pytest.raises(ValueError):
        ev_mod.funnel_conversion(_ev(spark, []), [])
    rows = [(0, 1, "click", "{}")]
    got = {
        r.step: r
        for r in ev_mod.funnel_conversion(
            _ev(spark, rows), ["view", "click"]
        ).collect()
    }
    assert got[1].users == 0 and got[1].rate == 0.0
    assert got[2].users == 0 and got[2].rate == 0.0


def test_json_props_stats(spark):
    rows = [
        (0, 1, "view", '{"k": 10}'),
        (1, 1, "view", '{"k": 30}'),
        (2, 1, "view", "{}"),  # missing key
        (3, 1, "click", '{"k": 7, "other": 1}'),
    ]
    got = {
        r.event_type: r
        for r in ev_mod.json_props_stats(_ev(spark, rows)).collect()
    }
    assert got["view"].n == 3 and got["view"].with_key == 2
    assert got["view"].sum_k == 40 and got["view"].max_k == 30
    assert abs(got["view"].avg_k - 20.0) < 1e-12
    assert got["click"].sum_k == 7


def test_histogram_pipeline_windows(spark):
    rows = [
        (0, 1, "view", "{}"),       # hour 0
        (60, 1, "view", "{}"),      # hour 0
        (3700, 1, "view", "{}"),    # hour 1
        (7300, 1, "view", "{}"),    # hour 2
        (7400, 1, "view", "{}"),    # hour 2
        (7500, 1, "view", "{}"),    # hour 2
    ]
    got = sorted(
        ev_mod.histogram_pipeline(_ev(spark, rows)).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.n for r in got] == [2, 1, 3]
    assert [r.cum for r in got] == [2, 3, 6]
    assert got[0].deriv is None
    assert [r.deriv for r in got[1:]] == [-1, 2]
    assert abs(got[2].mavg - 2.0) < 1e-12  # (2+1+3)/3
    assert abs(got[1].mavg - 1.5) < 1e-12  # trailing window shorter at head


def test_matrix_stats_closed_form(spark):
    import numpy as np

    from bm25_pagerank_rpi_spark.operators import events as ev

    rng = np.random.RandomState(11)
    x = rng.randn(200)
    y = 2.0 * x + rng.randn(200) * 0.1   # strongly correlated
    # exactly-representable constant: the moment form detects zero
    # variance only when the float arithmetic cancels exactly
    z = np.full(200, 3.0)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    out = {(r.field_a, r.field_b): r for r in
           ev.matrix_stats(df, ["x", "y", "z"]).collect()}
    assert set(out) == {("x","x"),("x","y"),("x","z"),("y","y"),("y","z"),("z","z")}
    assert out[("x", "y")]["count"] == 200
    assert abs(out[("x", "x")].covariance - np.var(x)) < 1e-5
    assert abs(out[("x", "y")].covariance - np.cov(x, y, bias=True)[0][1]) < 1e-5
    assert abs(out[("x", "y")].correlation - np.corrcoef(x, y)[0][1]) < 1e-5
    # constant field: zero variance -> NULL correlation, zero covariance
    assert out[("x", "z")].correlation is None
    assert abs(out[("x", "z")].covariance) < 1e-6
    assert abs(out[("x", "x")].mean_a - x.mean()) < 1e-5
