from __future__ import annotations

import math

import numpy as np
import pytest

from bm25_pagerank_rpi_spark.operators import residual_mlp as rm


class _TinyNoDrop(rm.ResidualMLP):
    """Small widths + dropout off: deterministic train-mode forward for
    finite-difference gradient checks."""

    WIDTHS = (5, 4)
    P_BLOCK = 0.0
    P_HEAD = 0.0


def _loss(model, X, y):
    logits = model.forward(X, train=True)
    loss, dlogits = rm._ce_label_smoothed(logits, y)
    return loss, dlogits


def test_erf_and_gelu_accuracy():
    # spot values of erf (Abramowitz & Stegun tables) and torch GELU
    xs = np.array([-2.0, -0.5, 0.0, 0.3, 1.0, 2.5])
    expect_erf = np.array(
        [-0.9953222650, -0.5204998778, 0.0, 0.3286267595, 0.8427007929, 0.9995930480]
    )
    assert np.allclose(rm._erf(xs), expect_erf, atol=2e-7)
    # gelu(1.0) = 0.5*(1+erf(1/sqrt2)) = 0.8413447461
    assert abs(rm.gelu(np.array([1.0]))[0] - 0.8413447461) < 1e-6
    # derivative consistency with the forward (central difference)
    h = 1e-6
    for x in [-1.7, -0.2, 0.4, 2.1]:
        num = (rm.gelu(np.array([x + h])) - rm.gelu(np.array([x - h])))[0] / (2 * h)
        assert abs(num - rm.gelu_grad(np.array([x]))[0]) < 1e-4


def test_gradcheck_full_network():
    """Finite-difference check through Linear/LayerNorm/GELU/Linear/
    BatchNorm/residual/GELU stacks and the smoothed-CE head."""
    rng = np.random.default_rng(7)
    model = _TinyNoDrop(3, seed=11)
    X = rng.normal(size=(6, 3))
    y = np.array([0, 1, 1, 0, 1, 0])
    _, dlogits = _loss(model, X, y)
    grads = model.backward(dlogits)
    h = 1e-6
    for name, p in model.params.items():
        flat = p.reshape(-1)
        for k in rng.choice(flat.size, size=min(4, flat.size), replace=False):
            orig = flat[k]
            flat[k] = orig + h
            lp, _ = _loss(model, X, y)
            model._cache = None
            flat[k] = orig - h
            lm, _ = _loss(model, X, y)
            model._cache = None
            flat[k] = orig
            num = (lp - lm) / (2 * h)
            ana = grads[name].reshape(-1)[k]
            assert abs(num - ana) < 1e-4 * max(1.0, abs(num), abs(ana)), (
                name, k, num, ana)


def test_batchnorm_running_stats_torch_semantics():
    rng = np.random.default_rng(0)
    x = rng.normal(loc=3.0, scale=2.0, size=(64, 4))
    g, b = np.ones(4), np.zeros(4)
    rmean, rvar = np.zeros(4), np.ones(4)
    y, _ = rm._batchnorm_fwd(x, g, b, rmean, rvar, train=True)
    # normalization uses biased batch var -> unit output variance
    assert np.allclose(y.mean(axis=0), 0.0, atol=1e-10)
    assert np.allclose(y.var(axis=0), 1.0, atol=1e-6)
    # running stats: momentum 0.1, unbiased var
    assert np.allclose(rmean, 0.1 * x.mean(axis=0))
    assert np.allclose(rvar, 0.9 + 0.1 * x.var(axis=0, ddof=1))
    # eval mode uses running stats, not batch stats
    y2, _ = rm._batchnorm_fwd(x[:2], g, b, rmean, rvar, train=False)
    expect = (x[:2] - rmean) / np.sqrt(rvar + 1e-5)
    assert np.allclose(y2, expect)


def test_label_smoothed_ce_matches_closed_form():
    logits = np.array([[2.0, -1.0], [0.5, 0.5]])
    y = np.array([0, 1])
    loss, grad = rm._ce_label_smoothed(logits, y, smoothing=0.1)
    # closed form: q = [0.95, 0.05] / [0.05, 0.95]
    p0 = np.exp([2.0, -1.0]) / np.exp([2.0, -1.0]).sum()
    expect0 = -(0.95 * math.log(p0[0]) + 0.05 * math.log(p0[1]))
    expect1 = -(0.05 * math.log(0.5) + 0.95 * math.log(0.5))
    assert abs(loss - (expect0 + expect1) / 2) < 1e-12
    assert np.allclose(grad[0], (p0 - np.array([0.95, 0.05])) / 2)


def test_adamw_decoupled_decay():
    # one step with zero gradient: pure decay p *= (1 - lr*wd)
    params = {"w": np.array([10.0])}
    opt = rm.AdamW(params, lr=0.1, weight_decay=0.5)
    opt.step({"w": np.array([0.0])})
    assert np.allclose(params["w"], 10.0 * (1 - 0.1 * 0.5))


def test_train_learns_separable_pairs():
    """End-to-end: the exact M4 architecture learns a separable pairwise
    task well above chance and the best-val checkpoint is restored."""
    rng = np.random.default_rng(42)
    n, d = 1200, 6
    w_true = rng.normal(size=d)
    X = rng.normal(size=(n, d))
    y = (X @ w_true > 0).astype(np.int64)
    Xv, yv = X[:240], y[:240]
    Xt, yt = X[240:], y[240:]
    model, hist = rm.train_residual_mlp(
        Xt, yt, Xv, yv, epochs=12, batch_size=128, seed=42)
    acc = (model.predict(Xv) == yv).mean()
    assert acc >= 0.9, (acc, hist["val_loss"])
    assert hist["best_val_loss"] == min(hist["val_loss"])


def test_serialization_round_trip():
    model = rm.ResidualMLP(4, seed=3)
    rng = np.random.default_rng(1)
    X = rng.normal(size=(8, 4))
    clone = rm.ResidualMLP.from_bytes(model.to_bytes())
    assert np.array_equal(model.forward(X), clone.forward(X))


def test_spark_fit_and_distributed_transform(spark):
    """fit_residual_reranker: distributed robust-scaler stats + driver fit;
    transform scores via mapInPandas and matches the driver-side forward."""
    rng = np.random.default_rng(5)
    n, d = 400, 4
    cols = [f"d_f{i}" for i in range(d)]
    X = rng.normal(size=(n, d))
    lab = np.where(X[:, 0] + X[:, 1] > 0, 1, -1)
    rows = [(int(lab[i]), *[float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, ["label", *cols])
    reranker, hist = rm.fit_residual_reranker(
        df, cols, epochs=3, batch_size=64)
    out = reranker.transform(df).orderBy(*cols).toPandas()
    assert set(["prediction", "p_rel"]).issubset(out.columns)
    # distributed forward == driver forward on the same scaled features
    xs = (out[cols].to_numpy(np.float64) - reranker.centers) / reranker.scales
    expect = reranker.model.predict_proba(xs)
    assert np.allclose(out["p_rel"].to_numpy(), expect[:, 1], atol=1e-12)
    assert np.array_equal(out["prediction"].to_numpy(),
                          expect.argmax(axis=1).astype("int32"))
    # scaler stats are sklearn RobustScaler semantics (median / IQR)
    med = np.median(X, axis=0)
    iqr = np.percentile(X, 75, axis=0) - np.percentile(X, 25, axis=0)
    assert np.allclose(reranker.centers, med, atol=1e-9)
    assert np.allclose(reranker.scales, iqr, atol=1e-9)
