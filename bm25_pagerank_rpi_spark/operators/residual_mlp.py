"""M4: the reference's residual-MLP reranker, exact architecture, in numpy.

The reference trains a Torch network on robust-scaled pairwise-difference
features (training/nn_model.py:4-39): six ResidualBlocks
(Linear -> LayerNorm -> GELU -> Dropout(0.3) -> Linear -> BatchNorm1d,
plus a Linear shortcut when dims change, GELU after the residual add)
with widths input->128->256->512->256->128->64, then Dropout(0.4) and a
2-logit softmax head; CrossEntropyLoss(label_smoothing=0.1), AdamW
(lr=1e-3, weight_decay=2e-5), ReduceLROnPlateau(factor=0.5, patience=10,
min_lr=1e-5), early stop after 15 non-improving epochs, batch 16384
(training/train.py:10-84, load_data.py:28-48). Torch is not in this
environment, so forward/backward/AdamW are implemented here directly on
numpy arrays — same layers, same init family, same loss and schedule.

Division of labor at cluster scale: feature generation, robust-scaler
statistics, and inference are distributed (Spark aggregations and an
Arrow-batched `mapInPandas` forward pass with broadcast weights); the
gradient loop itself runs driver-side on the sampled pairwise training
set, exactly as the reference trains on one node. On a real cluster the
documented seam for multi-node training is `TorchDistributor`; the
trainer below is the single-node twin of training/train.py.
"""
from __future__ import annotations

import io
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x: np.ndarray) -> np.ndarray:
    # Abramowitz & Stegun 7.1.26 rational approximation, |error| < 1.5e-7,
    # vectorized (scipy is not in this environment). Odd-reflected.
    sign = np.sign(x)
    a = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
              + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * np.exp(-a * a))


def gelu(x: np.ndarray) -> np.ndarray:
    """Exact-erf GELU (torch nn.GELU default), 0.5*x*(1+erf(x/sqrt(2)))."""
    return 0.5 * x * (1.0 + _erf(x / _SQRT2))


def gelu_grad(x: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + _erf(x / _SQRT2)) + x * _INV_SQRT_2PI * np.exp(-0.5 * x * x)


# ---------------------------------------------------------------------------
# layers — parameters live in flat dicts name -> float64 array; each forward
# returns (y, cache) and each backward consumes (dy, cache) and fills grads.


def _linear_fwd(x, W, b):
    return x @ W.T + b, x


def _linear_bwd(dy, x, W):
    return dy @ W, dy.T @ x, dy.sum(axis=0)


_EPS_NORM = 1e-5  # torch default for both LayerNorm and BatchNorm1d


def _layernorm_fwd(x, g, b):
    mu = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    inv = 1.0 / np.sqrt(var + _EPS_NORM)
    xhat = (x - mu) * inv
    return g * xhat + b, (xhat, inv)


def _layernorm_bwd(dy, cache, g):
    xhat, inv = cache
    dg = (dy * xhat).sum(axis=0)
    db = dy.sum(axis=0)
    dxh = dy * g
    dx = inv * (
        dxh
        - dxh.mean(axis=1, keepdims=True)
        - xhat * (dxh * xhat).mean(axis=1, keepdims=True)
    )
    return dx, dg, db


def _batchnorm_fwd(x, g, b, running_mean, running_var, train, momentum=0.1):
    if train:
        n = x.shape[0]
        if n < 2:
            raise ValueError("BatchNorm requires batch size >= 2 in training")
        mu = x.mean(axis=0)
        var = x.var(axis=0)
        # torch tracks the unbiased variance in running stats but
        # normalizes with the biased one
        running_mean *= 1.0 - momentum
        running_mean += momentum * mu
        running_var *= 1.0 - momentum
        running_var += momentum * var * (n / (n - 1))
    else:
        mu, var = running_mean, running_var
    inv = 1.0 / np.sqrt(var + _EPS_NORM)
    xhat = (x - mu) * inv
    return g * xhat + b, (xhat, inv)


def _batchnorm_bwd(dy, cache, g):
    xhat, inv = cache
    dg = (dy * xhat).sum(axis=0)
    db = dy.sum(axis=0)
    dxh = dy * g
    dx = inv * (
        dxh
        - dxh.mean(axis=0)
        - xhat * (dxh * xhat).mean(axis=0)
    )
    return dx, dg, db


def _dropout_fwd(x, p, train, rng):
    if not train or p == 0.0:
        return x, None
    mask = (rng.random(x.shape) >= p) / (1.0 - p)  # inverted dropout
    return x * mask, mask


def _dropout_bwd(dy, mask):
    return dy if mask is None else dy * mask


def _ce_label_smoothed(logits, y, smoothing=0.1):
    """Softmax cross-entropy with label smoothing (torch CrossEntropyLoss
    semantics): target dist q = (1-eps)*onehot + eps/K; mean reduction.
    Returns (loss, dlogits)."""
    n, k = logits.shape
    z = logits - logits.max(axis=1, keepdims=True)
    ez = np.exp(z)
    p = ez / ez.sum(axis=1, keepdims=True)
    logp = z - np.log(ez.sum(axis=1, keepdims=True))
    q = np.full((n, k), smoothing / k)
    q[np.arange(n), y] += 1.0 - smoothing
    loss = -(q * logp).sum() / n
    return loss, (p - q) / n


class ResidualMLP:
    """nn_model.NeuralNetwork re-expressed on numpy arrays.

    Parameters are float64 (the gradient loop is driver-side; fp32 is an
    inference-time cast). `forward(train=True)` stores the caches that
    `backward` consumes; eval-mode forward is pure."""

    WIDTHS = (128, 256, 512, 256, 128, 64)
    P_BLOCK, P_HEAD = 0.3, 0.4

    def __init__(self, input_dim: int, seed: int = 42):
        self.input_dim = input_dim
        self.params: dict[str, np.ndarray] = {}
        self.running: dict[str, np.ndarray] = {}
        rng = np.random.default_rng(seed)
        dims = [input_dim, *self.WIDTHS]
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            self._init_linear(rng, f"b{i}.fc1", din, dout)
            self.params[f"b{i}.ln.g"] = np.ones(dout)
            self.params[f"b{i}.ln.b"] = np.zeros(dout)
            self._init_linear(rng, f"b{i}.fc2", dout, dout)
            self.params[f"b{i}.bn.g"] = np.ones(dout)
            self.params[f"b{i}.bn.b"] = np.zeros(dout)
            self.running[f"b{i}.bn.mean"] = np.zeros(dout)
            self.running[f"b{i}.bn.var"] = np.ones(dout)
            if din != dout:
                self._init_linear(rng, f"b{i}.sc", din, dout)
        self._init_linear(rng, "head", dims[-1], 2)
        self.n_blocks = len(self.WIDTHS)
        self._cache = None

    def _init_linear(self, rng, name, din, dout):
        # torch Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(din))
        # for the weight, U(+-1/sqrt(din)) for the bias
        bound = 1.0 / math.sqrt(din)
        self.params[f"{name}.W"] = rng.uniform(-bound, bound, (dout, din))
        self.params[f"{name}.b"] = rng.uniform(-bound, bound, dout)

    # -- forward ----------------------------------------------------------
    def forward(self, x: np.ndarray, train: bool = False,
                rng: np.random.Generator | None = None) -> np.ndarray:
        if train and rng is None:
            rng = np.random.default_rng(0)
        P = self.params
        caches = []
        h = x
        for i in range(self.n_blocks):
            xin = h
            z1, _ = _linear_fwd(h, P[f"b{i}.fc1.W"], P[f"b{i}.fc1.b"])
            ln, c_ln = _layernorm_fwd(z1, P[f"b{i}.ln.g"], P[f"b{i}.ln.b"])
            a1 = gelu(ln)
            d1, m1 = _dropout_fwd(a1, self.P_BLOCK, train, rng)
            z2, _ = _linear_fwd(d1, P[f"b{i}.fc2.W"], P[f"b{i}.fc2.b"])
            bn, c_bn = _batchnorm_fwd(
                z2, P[f"b{i}.bn.g"], P[f"b{i}.bn.b"],
                self.running[f"b{i}.bn.mean"], self.running[f"b{i}.bn.var"],
                train,
            )
            if f"b{i}.sc.W" in P:
                sc, _ = _linear_fwd(xin, P[f"b{i}.sc.W"], P[f"b{i}.sc.b"])
            else:
                sc = xin
            pre = bn + sc
            h = gelu(pre)
            caches.append((xin, z1, ln, c_ln, m1, d1, c_bn, pre))
        dh, mh = _dropout_fwd(h, self.P_HEAD, train, rng)
        logits, _ = _linear_fwd(dh, P["head.W"], P["head.b"])
        if train:
            self._cache = (caches, dh, mh)
        return logits

    # -- backward ---------------------------------------------------------
    def backward(self, dlogits: np.ndarray) -> dict[str, np.ndarray]:
        assert self._cache is not None, "call forward(train=True) first"
        caches, dh, mh = self._cache
        P = self.params
        G: dict[str, np.ndarray] = {}
        dx, G["head.W"], G["head.b"] = _linear_bwd(dlogits, dh, P["head.W"])
        dx = _dropout_bwd(dx, mh)
        for i in reversed(range(self.n_blocks)):
            xin, z1, ln, c_ln, m1, d1, c_bn, pre = caches[i]
            dpre = dx * gelu_grad(pre)
            dbn, dsc = dpre, dpre
            dz2, G[f"b{i}.bn.g"], G[f"b{i}.bn.b"] = _batchnorm_bwd(
                dbn, c_bn, P[f"b{i}.bn.g"])
            dd1, G[f"b{i}.fc2.W"], G[f"b{i}.fc2.b"] = _linear_bwd(
                dz2, d1, P[f"b{i}.fc2.W"])
            da1 = _dropout_bwd(dd1, m1)
            dln = da1 * gelu_grad(ln)
            dz1, G[f"b{i}.ln.g"], G[f"b{i}.ln.b"] = _layernorm_bwd(
                dln, c_ln, P[f"b{i}.ln.g"])
            dx, G[f"b{i}.fc1.W"], G[f"b{i}.fc1.b"] = _linear_bwd(
                dz1, xin, P[f"b{i}.fc1.W"])
            if f"b{i}.sc.W" in P:
                dxs, G[f"b{i}.sc.W"], G[f"b{i}.sc.b"] = _linear_bwd(
                    dsc, xin, P[f"b{i}.sc.W"])
                dx = dx + dxs
            else:
                dx = dx + dsc
        self._cache = None
        return G

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        z = self.forward(np.asarray(x, dtype=np.float64), train=False)
        z = z - z.max(axis=1, keepdims=True)
        ez = np.exp(z)
        return ez / ez.sum(axis=1, keepdims=True)

    def predict(self, x: np.ndarray) -> np.ndarray:
        return self.forward(np.asarray(x, dtype=np.float64),
                            train=False).argmax(axis=1)

    # -- (de)serialization -----------------------------------------------
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, __input_dim=np.array([self.input_dim]),
                 **{f"p.{k}": v for k, v in self.params.items()},
                 **{f"r.{k}": v for k, v in self.running.items()})
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ResidualMLP":
        with np.load(io.BytesIO(blob)) as z:
            model = cls(int(z["__input_dim"][0]), seed=0)
            for k in z.files:
                if k.startswith("p."):
                    model.params[k[2:]] = z[k]
                elif k.startswith("r."):
                    model.running[k[2:]] = z[k]
        return model


class AdamW:
    """Decoupled weight decay (torch optim.AdamW defaults: betas=(0.9,
    0.999), eps=1e-8); decay applies to every parameter, as the reference
    passes model.parameters() wholesale (train.py:15-19)."""

    def __init__(self, params: dict[str, np.ndarray], lr=1e-3,
                 betas=(0.9, 0.999), eps=1e-8, weight_decay=2e-5):
        self.params = params
        self.lr, self.eps, self.wd = lr, eps, weight_decay
        self.b1, self.b2 = betas
        self.t = 0
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}

    def step(self, grads: dict[str, np.ndarray]) -> None:
        self.t += 1
        bc1 = 1.0 - self.b1 ** self.t
        bc2 = 1.0 - self.b2 ** self.t
        for k, p in self.params.items():
            g = grads[k]
            m = self.m[k]
            v = self.v[k]
            m *= self.b1
            m += (1.0 - self.b1) * g
            v *= self.b2
            v += (1.0 - self.b2) * g * g
            p -= self.lr * self.wd * p
            p -= self.lr * (m / bc1) / (np.sqrt(v / bc2) + self.eps)


def train_residual_mlp(
    X: np.ndarray,
    y: np.ndarray,
    X_val: np.ndarray,
    y_val: np.ndarray,
    *,
    epochs: int = 50,
    batch_size: int = 16384,
    lr: float = 1e-3,
    weight_decay: float = 2e-5,
    label_smoothing: float = 0.1,
    lr_factor: float = 0.5,
    lr_patience: int = 10,
    min_lr: float = 1e-5,
    stop_patience: int = 15,
    seed: int = 42,
    verbose: bool = False,
) -> tuple[ResidualMLP, dict]:
    """The training loop of training/train.py:10-84: per-epoch shuffled
    minibatches, smoothed-CE + AdamW, ReduceLROnPlateau on val loss
    (mode=min, rel threshold 1e-4), best-checkpoint keep + early stop."""
    X = np.asarray(X, dtype=np.float64)
    X_val = np.asarray(X_val, dtype=np.float64)
    y = np.asarray(y, dtype=np.int64)
    y_val = np.asarray(y_val, dtype=np.int64)
    model = ResidualMLP(X.shape[1], seed=seed)
    opt = AdamW(model.params, lr=lr, weight_decay=weight_decay)
    rng = np.random.default_rng(seed)
    history = {"train_loss": [], "val_loss": [], "lr": []}

    best_val = math.inf
    best_state: tuple[dict, dict] | None = None
    bad_lr = bad_stop = 0
    for epoch in range(epochs):
        order = rng.permutation(len(X))
        total = 0.0
        n_batches = 0
        for lo in range(0, len(X), batch_size):
            idx = order[lo:lo + batch_size]
            if len(idx) < 2:
                continue  # BatchNorm floor; torch drops via drop_last-like skip
            logits = model.forward(X[idx], train=True, rng=rng)
            loss, dlogits = _ce_label_smoothed(logits, y[idx], label_smoothing)
            opt.step(model.backward(dlogits))
            total += loss
            n_batches += 1
        val_loss = 0.0
        for lo in range(0, len(X_val), batch_size):
            logits = model.forward(X_val[lo:lo + batch_size], train=False)
            loss, _ = _ce_label_smoothed(logits, y_val[lo:lo + batch_size],
                                         label_smoothing)
            val_loss += loss * min(batch_size, len(X_val) - lo)
        val_loss /= max(len(X_val), 1)
        history["train_loss"].append(total / max(n_batches, 1))
        history["val_loss"].append(val_loss)
        history["lr"].append(opt.lr)
        if verbose:
            print(f"epoch {epoch + 1}: train {total / max(n_batches, 1):.4f} "
                  f"val {val_loss:.4f} lr {opt.lr:g}")

        # ReduceLROnPlateau(mode=min, threshold=1e-4 rel, patience=10)
        if val_loss < best_val * (1.0 - 1e-4):
            bad_lr = 0
        else:
            bad_lr += 1
            if bad_lr > lr_patience:
                opt.lr = max(opt.lr * lr_factor, min_lr)
                bad_lr = 0
        # best-checkpoint + early stop (train.py:31-76)
        if val_loss < best_val:
            best_val = val_loss
            best_state = (
                {k: v.copy() for k, v in model.params.items()},
                {k: v.copy() for k, v in model.running.items()},
            )
            bad_stop = 0
        else:
            bad_stop += 1
            if bad_stop >= stop_patience:
                break
    if best_state is not None:
        model.params, model.running = best_state
    history["best_val_loss"] = best_val
    return model, history


# ---------------------------------------------------------------------------
# Spark glue: distributed scaler stats + sampled driver-side fit,
# distributed Arrow-batched inference.


class ResidualRerankerModel:
    """Fitted reranker: robust-scaler stats + network weights. `transform`
    runs the eval-mode forward distributed via mapInPandas — weights ride
    to executors once per task as a broadcast-sized closure constant
    (~3 MB), each Arrow batch is one numpy matmul chain, no Python
    row-at-a-time work."""

    def __init__(self, model: ResidualMLP, feature_cols: list[str],
                 centers: np.ndarray, scales: np.ndarray):
        self.model = model
        self.feature_cols = list(feature_cols)
        self.centers = centers
        self.scales = scales

    def transform(self, df: DataFrame, pred_col: str = "prediction",
                  prob_col: str = "p_rel") -> DataFrame:
        blob = self.model.to_bytes()
        cols = self.feature_cols
        centers, scales = self.centers, self.scales
        out_schema = f"{df.schema.simpleString()[7:-1]},{pred_col}:int,{prob_col}:double"

        def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            net = ResidualMLP.from_bytes(blob)
            for pdf in batches:
                if len(pdf) == 0:
                    pdf[pred_col] = pd.Series([], dtype="int32")
                    pdf[prob_col] = pd.Series([], dtype="float64")
                    yield pdf
                    continue
                x = (pdf[cols].to_numpy(dtype=np.float64) - centers) / scales
                proba = net.predict_proba(x)
                pdf[pred_col] = proba.argmax(axis=1).astype("int32")
                pdf[prob_col] = proba[:, 1]
                yield pdf

        return df.mapInPandas(_score, schema=out_schema)

    # model + scaler in one artifact, mirroring best_model.pth +
    # feature_scaler.joblib (training/train.py:75,114-115)
    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            np.savez(
                f,
                __net=np.frombuffer(self.model.to_bytes(), dtype=np.uint8),
                __cols=np.array(self.feature_cols, dtype=object),
                __centers=self.centers,
                __scales=self.scales,
            )

    @classmethod
    def load(cls, path: str) -> "ResidualRerankerModel":
        with np.load(path, allow_pickle=True) as z:
            return cls(
                ResidualMLP.from_bytes(z["__net"].tobytes()),
                [str(c) for c in z["__cols"]],
                z["__centers"],
                z["__scales"],
            )


def fit_residual_reranker(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    *,
    val_fraction: float = 0.2,
    max_driver_rows: int = 2_000_000,
    seed: int = 42,
    **train_kw,
) -> tuple[ResidualRerankerModel, dict]:
    """E3's training pipeline on Spark: RobustScaler stats as one
    distributed agg (ltr.robust_scale semantics: median / IQR, IQR==0 ->
    1, training/load_data.py:40-41), labels {1,-1} -> {1,0}
    (load_data.py:37), deterministic hash split train/val
    (train.py's train_test_split 0.2), then the numpy gradient loop on
    the collected sample. `max_driver_rows` bounds the collect — the
    pairwise set is already k-sampled upstream (O4/O5); raise it only
    with driver memory to match."""
    aggs = []
    for c in feature_cols:
        aggs += [
            F.percentile(c, F.lit(0.5)).alias(f"md_{c}"),
            (F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25))).alias(f"iqr_{c}"),
        ]
    stats = train.agg(*aggs).collect()[0]
    centers = np.array([stats[f"md_{c}"] for c in feature_cols], dtype=np.float64)
    scales = np.array(
        [stats[f"iqr_{c}"] if stats[f"iqr_{c}"] != 0 else 1.0 for c in feature_cols],
        dtype=np.float64,
    )

    y01 = ((F.col(label_col) + 1) / 2).cast("int")
    sample = (
        train.select(*feature_cols, y01.alias("_y"))
        .limit(max_driver_rows)
        .toPandas()
    )
    X = (sample[feature_cols].to_numpy(dtype=np.float64) - centers) / scales
    y = sample["_y"].to_numpy(dtype=np.int64)
    rng = np.random.default_rng(seed)
    val_mask = rng.random(len(X)) < val_fraction
    model, history = train_residual_mlp(
        X[~val_mask], y[~val_mask], X[val_mask], y[val_mask],
        seed=seed, **train_kw,
    )
    return ResidualRerankerModel(model, feature_cols, centers, scales), history
