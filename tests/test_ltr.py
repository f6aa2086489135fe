"""LTR pipeline semantics: LETOR parse, pairwise gen, scalers,
predict/confusion, and MLlib training sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import ltr

LINES = [
    "2 qid:10 1:1.5 2:0.0 3:-3.25",
    "0 qid:10 1:0.5 3:2.0",            # feature 2 missing -> 0.0
    "4 qid:11 2:7.0",
    "1 qid:11",                        # no features at all
]


def _lines_df(spark):
    return spark.createDataFrame([(l,) for l in LINES], "line string")


def test_parse_letor(spark):
    out = ltr.parse_letor(_lines_df(spark), [1, 2, 3]).collect()
    rows = {(r.relevance, r.qid): (r.f1, r.f2, r.f3) for r in out}
    assert rows[(2, 10)] == (1.5, 0.0, -3.25)
    assert rows[(0, 10)] == (0.5, 0.0, 2.0)
    assert rows[(4, 11)] == (0.0, 7.0, 0.0)
    assert rows[(1, 11)] == (0.0, 0.0, 0.0)


def test_pairwise_examples_both_directions_and_label(spark):
    parsed = spark.createDataFrame(
        [(0, 1, 1.0), (3, 1, 2.0), (5, 1, 3.0), (1, 2, 4.0)],
        "relevance int, qid int, f1 double",
    )
    out = ltr.pairwise_examples(parsed, ["f1"], min_diff=3).collect()
    # within qid=1 ordinals by (rel, f1): rel0->i1, rel3->i2, rel5->i3
    got = {(r.i, r.j): (r.label, r.d_f1) for r in out if r.qid == 1}
    assert got == {
        (1, 2): (-1, -1.0), (2, 1): (1, 1.0),   # |0-3| >= 3
        (1, 3): (-1, -2.0), (3, 1): (1, 2.0),   # |0-5| >= 3
    }
    assert not any(r.qid == 2 for r in out)  # singleton qid -> no pairs


def test_sample_deterministic_is_stable_and_k(spark):
    parsed = spark.createDataFrame(
        [(i % 6, i // 6, float(i)) for i in range(120)],
        "relevance int, qid int, f1 double",
    )
    pairs = ltr.pairwise_examples(parsed, ["f1"], min_diff=3)
    s1 = sorted(
        (r.qid, r.i, r.j) for r in ltr.sample_deterministic(pairs, 50, ["qid", "i", "j"]).collect()
    )
    s2 = sorted(
        (r.qid, r.i, r.j) for r in ltr.sample_deterministic(pairs, 50, ["qid", "i", "j"]).collect()
    )
    assert s1 == s2 and len(s1) == 50


def test_standardize_population_std(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = sorted(r.z_x for r in ltr.standardize(df, ["x"]).collect())
    mu, sd = np.mean(vals), np.std(vals)  # np.std = population std
    expect = sorted((v - mu) / sd for v in vals)
    assert out == pytest.approx(expect, abs=1e-12)
    # zero-variance column -> divisor 1 (regression_model.go:99)
    cdf = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    zs = [r.z_x for r in ltr.standardize(cdf, ["x"]).collect()]
    assert zs == [0.0, 0.0]


def test_robust_scale_median_iqr(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = sorted(r.r_x for r in ltr.robust_scale(df, ["x"]).collect())
    md = np.percentile(vals, 50)
    iqr = np.percentile(vals, 75) - np.percentile(vals, 25)
    expect = sorted((v - md) / iqr for v in vals)
    assert out == pytest.approx(expect, abs=1e-12)


def test_predict_and_confusion(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, 0.5), (-1, -1.0), (-1, 1.5)], "label int, x double"
    )
    pred = ltr.predict_linear(df, {"x": 1.0}, bias=-1.0)
    # sigma(x-1) >= 0.5 <=> x >= 1
    rows = {(r.label, r.x): r.prediction for r in pred.collect()}
    assert rows[(1, 2.0)] == 1 and rows[(1, 0.5)] == -1
    assert rows[(-1, -1.0)] == -1 and rows[(-1, 1.5)] == 1
    cm = {(r.label, r.prediction): r.n for r in ltr.confusion_matrix(pred).collect()}
    assert cm == {(1, 1): 1, (1, -1): 1, (-1, -1): 1, (-1, 1): 1}
    assert ltr.accuracy(pred) == pytest.approx(0.5)


def test_train_pairwise_lr_learns_separable_data(spark):
    rng = np.random.RandomState(0)
    X = rng.randn(400, 3)
    y = np.where(X @ np.array([1.0, -2.0, 0.5]) > 0, 1, -1)
    df = spark.createDataFrame(
        [(int(y[i]), *[float(v) for v in X[i]]) for i in range(400)],
        "label int, f1 double, f2 double, f3 double",
    )
    model = ltr.train_pairwise_lr(df, ["f1", "f2", "f3"])
    pred = model.transform(df.withColumn("_y", ((F.col("label") + 1) / 2).cast("double")))
    acc = pred.filter(F.col("prediction") == F.col("_y")).count() / 400
    assert acc > 0.95
