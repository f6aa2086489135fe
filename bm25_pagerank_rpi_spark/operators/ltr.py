"""Learning-to-rank side pipelines — the Spark twins of the reference's
datagen + training commands.

  parse_letor       — S7 (internal/datagen/microsoft_dataset_creation.go:42-170):
                      parse "rel qid:X 1:v 2:v ..." LETOR lines, keep a
                      configurable feature-id subset. Pure Catalyst
                      (split + map_from_entries), no UDF.
  pairwise_examples — J4 + T5 (microsoft_dataset_creation.go:183-247):
                      within-qid ordered pairs with |rel_i - rel_j| >=
                      min_diff, element-wise feature differencing, label
                      sign(rel_i - rel_j) in {1,-1}.
  sample_deterministic — O4/O5 substitute: the reference reservoir-samples
                      and Fisher-Yates-shuffles with UNSEEDED math/rand,
                      so exact-sample parity is impossible by
                      construction; we pin ORDER BY phash(qid,i,j) LIMIT k
                      — deterministic, engine-portable, distributed
                      (TakeOrderedAndProject, no full sort materialized).
  standardize       — A10 (internal/training/regression_model.go:58-117):
                      z-score with POPULATION std (divide by n), std==0 -> 1.
  robust_scale      — A11 (training/load_data.py:40-41): (x - median)/IQR.
  predict_linear    — M2 (regression_model.go:233-257): sigmoid(w.x + b)
                      >= 0.5 -> 1 else -1.
  confusion_matrix  — A9 (cmd/regressiontrain/main.go:63-91).
  train_pairwise_lr — M1/M3: MLlib LogisticRegression (+ optional CV grid)
                      standing in for the hand-rolled full-batch GD; exact
                      GD parity is NOT required (the trained model is
                      advisory — serving ranks by raw BM25, ranker.go:44-56).

Scale notes: every stage is a projection, a within-qid self-join (skew:
salt or AQE for giant qid groups), or a global agg broadcast back —
nothing driver-side except the tiny stats row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import phash


def parse_letor(lines: DataFrame, feature_ids: list[int], line_col: str = "line") -> DataFrame:
    """(relevance int, qid int, f<id> double ...) from raw LETOR lines.

    Missing feature ids default to 0.0 (Go map zero-value semantics,
    microsoft_dataset_creation.go:120-134)."""
    toks = F.split(F.trim(F.col(line_col)), r"\s+")
    kv = F.map_from_entries(
        F.transform(
            F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
            lambda t: F.struct(
                F.split(t, ":")[0].cast("int").alias("k"),
                F.split(t, ":")[1].cast("double").alias("v"),
            ),
        )
    )
    out = lines.select(
        toks[0].cast("int").alias("relevance"),
        F.split(toks[1], ":")[1].cast("int").alias("qid"),
        kv.alias("_kv"),
    )
    for fid in feature_ids:
        out = out.withColumn(f"f{fid}", F.coalesce(F.col("_kv")[fid], F.lit(0.0)))
    return out.drop("_kv")


def pairwise_examples(
    parsed: DataFrame, feature_cols: list[str], min_diff: int = 3
) -> DataFrame:
    """(qid, i, j, label, d_<col>...) — ordered pairs (both directions,
    microsoft_dataset_creation.go:190-247), feature diff a-b, label
    sign(rel_a - rel_b). ``i``/``j`` are per-qid row ordinals."""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(*[F.col(c) for c in ["relevance", *feature_cols]])
    rows = parsed.withColumn("i", F.row_number().over(w))
    a = rows.select(
        "qid",
        F.col("i"),
        F.col("relevance").alias("rel_a"),
        *[F.col(c).alias(f"a_{c}") for c in feature_cols],
    )
    b = rows.select(
        "qid",
        F.col("i").alias("j"),
        F.col("relevance").alias("rel_b"),
        *[F.col(c).alias(f"b_{c}") for c in feature_cols],
    )
    return (
        a.join(b, "qid")
        .where(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("rel_a") - F.col("rel_b")) >= min_diff)
        )
        .select(
            "qid",
            "i",
            "j",
            F.when(F.col("rel_a") > F.col("rel_b"), 1).otherwise(-1).alias("label"),
            *[(F.col(f"a_{c}") - F.col(f"b_{c}")).alias(f"d_{c}") for c in feature_cols],
        )
    )


def sample_deterministic(pairs: DataFrame, k: int, key_cols: list[str]) -> DataFrame:
    """Deterministic k-sample: order by the portable hash of the key tuple.
    Uniform-ish like reservoir sampling but reproducible across engines
    and cluster sizes (the unseeded-rand reference cannot be reproduced)."""
    h = phash(F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols]))
    return pairs.withColumn("_h", h).orderBy("_h").limit(k).drop("_h")


def standardize(df: DataFrame, cols: list[str]) -> DataFrame:
    """z-score with population std; std==0 maps to divisor 1
    (regression_model.go:99-117). Stats are one global agg broadcast back."""
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(f"_mu_{c}"), F.stddev_pop(c).alias(f"_sd_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        sd = F.when(F.col(f"_sd_{c}") == 0, F.lit(1.0)).otherwise(F.col(f"_sd_{c}"))
        out = out.withColumn(f"z_{c}", (F.col(c) - F.col(f"_mu_{c}")) / sd)
    return out.drop(*[f"_mu_{c}" for c in cols], *[f"_sd_{c}" for c in cols])


def robust_scale(df: DataFrame, cols: list[str]) -> DataFrame:
    """(x - median) / IQR with IQR==0 -> divisor 1 (sklearn RobustScaler
    semantics, training/load_data.py:40-41). Exact percentiles (sort-based);
    at extreme scale swap to approx_percentile and accept the epsilon."""
    aggs = []
    for c in cols:
        aggs += [
            F.percentile(c, F.lit(0.5)).alias(f"_md_{c}"),
            (F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25))).alias(f"_iqr_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        iqr = F.when(F.col(f"_iqr_{c}") == 0, F.lit(1.0)).otherwise(F.col(f"_iqr_{c}"))
        out = out.withColumn(f"r_{c}", (F.col(c) - F.col(f"_md_{c}")) / iqr)
    return out.drop(*[f"_md_{c}" for c in cols], *[f"_iqr_{c}" for c in cols])


def predict_linear(
    df: DataFrame, weights: dict[str, float], bias: float, out_col: str = "prediction"
) -> DataFrame:
    """sigma(w.x + b) >= 0.5 -> 1 else -1 (regression_model.go:233-257)."""
    z: Column = F.lit(bias)
    for c, w in weights.items():
        z = z + F.lit(w) * F.col(c)
    sigma = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, F.when(sigma >= 0.5, 1).otherwise(-1))


def confusion_matrix(df: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """(label, prediction, n) — A9's TP/FP/TN/FN counts as one hash agg."""
    return (
        df.groupBy(label_col, pred_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def accuracy(df: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> float:
    row = df.agg(
        F.avg((F.col(label_col) == F.col(pred_col)).cast("double")).alias("acc")
    ).collect()[0]
    return float(row.acc)


def train_pairwise_lr(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    reg_param: float = 0.0,
    cv_grid: list[float] | None = None,
):
    """MLlib stand-in for M1 (full-batch GD logistic regression) and M3
    (5-fold grid search over lambda). Labels arrive in {1,-1} and are
    normalized to {1,0} (T6, training/load_data.py:37-38). Returns the
    fitted pipeline model; ``model.transform`` emits ``prediction`` in
    {0.0, 1.0}."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    data = train.withColumn("_y", ((F.col(label_col) + 1) / 2).cast("double"))
    stages = [
        VectorAssembler(inputCols=feature_cols, outputCol="_fv"),
        StandardScaler(inputCol="_fv", outputCol="_sv", withMean=True, withStd=True),
        LogisticRegression(featuresCol="_sv", labelCol="_y", regParam=reg_param, maxIter=100),
    ]
    return _fit_pipeline(stages, data, cv_grid)


def train_pairwise_mlp(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    hidden: list[int] | None = None,
    max_iter: int = 100,
    seed: int = 42,
):
    """M4 stand-in: the reference trains a Torch residual MLP on the
    pairwise examples (training/nn_model.py:4-39, train.py:10-84; 2-class
    softmax head, published 81.92% test accuracy, test.py:69-84). Torch is
    not in this environment and a residual/dropout architecture is not
    expressible in MLlib, so the Spark twin is MLlib's
    ``MultilayerPerceptronClassifier`` — a plain feed-forward net with a
    softmax head on the same scaled pairwise-difference features, trained
    distributed (L-BFGS over partition-parallel gradient aggregation)
    instead of on one GPU. Same role in the system: advisory re-scorer;
    serving still ranks on raw BM25 (ranker.go:44-56)."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    data = train.withColumn("_y", ((F.col(label_col) + 1) / 2).cast("double"))
    layers = [len(feature_cols), *(hidden or [16, 8]), 2]
    stages = [
        VectorAssembler(inputCols=feature_cols, outputCol="_fv"),
        StandardScaler(inputCol="_fv", outputCol="_sv", withMean=True, withStd=True),
        MultilayerPerceptronClassifier(
            featuresCol="_sv", labelCol="_y", layers=layers,
            maxIter=max_iter, seed=seed,
        ),
    ]
    return _fit_pipeline(stages, data, cv_grid=None)


def train_pairwise_gbt(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    max_iter: int = 20,
    max_depth: int = 3,
    seed: int = 42,
):
    """Gradient-boosted-trees pairwise classifier — the LambdaMART-family
    member of the trainer seam (pairwise logistic loss over feature
    differences ~= LambdaRank with uniform |delta-metric| weights).
    MLlib's ``GBTClassifier`` trains the ensemble fully distributed
    (per-iteration histogram aggregation), no feature scaling needed —
    trees split on raw thresholds, so the scaler stage is deliberately
    absent. Same advisory-re-scorer role as the LR/MLP trainers; serving
    still ranks on raw BM25 (ranker.go:44-56)."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    data = train.withColumn("_y", ((F.col(label_col) + 1) / 2).cast("double"))
    stages = [
        VectorAssembler(inputCols=feature_cols, outputCol="_fv"),
        GBTClassifier(
            featuresCol="_fv", labelCol="_y", maxIter=max_iter,
            maxDepth=max_depth, seed=seed,
        ),
    ]
    return _fit_pipeline(stages, data, cv_grid=None)


def _fit_pipeline(stages, data, cv_grid):
    from pyspark.ml import Pipeline
    pipe = Pipeline(stages=stages)
    if cv_grid:
        from pyspark.ml.evaluation import BinaryClassificationEvaluator
        from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

        grid = (
            ParamGridBuilder().addGrid(stages[2].regParam, list(cv_grid)).build()
        )
        cv = CrossValidator(
            estimator=pipe,
            estimatorParamMaps=grid,
            evaluator=BinaryClassificationEvaluator(labelCol="_y"),
            numFolds=5,
            seed=42,
        )
        return cv.fit(data)
    return pipe.fit(data)
