"""End-to-end LTR pipelines — the Spark twins of the reference's two
offline commands (SURVEY.md §3 E2/E3), composed from operators/ltr.py.

E2  cmd/datagen  (reference cmd/datagen/main.go:12-49):
    LETOR text file -> parse (S7, 24-of-136 feature subset) -> within-qid
    pairwise examples with |rel diff| >= min_diff (J4) + feature
    differencing (T5) -> deterministic k-sample (O4/O5 substitute) ->
    CSV with the 25-column header (S9) or parquet (S8's gob stand-in).

E3  cmd/regressiontrain  (reference cmd/regressiontrain/main.go:25-92):
    examples -> label normalize {1,-1}->{1,0} (T6) -> StandardScaler +
    LogisticRegression (M1) with optional 5-fold CV grid (M3) ->
    confusion matrix + accuracy (A9).

The reference keeps 24 of MSLR's 136 features via a hardcoded id map
(internal/datagen/microsoft_dataset_creation.go:96-134); MSLR_FEATURE_IDS
reproduces that list's ids 1:1 so a user pointing this pipeline at real
MSLR-WEB30K files gets the same 24 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ltr

# Reference feature-id subset (microsoft_dataset_creation.go:81-130), the
# whole-document-stream MSLR columns: covered-term number/ratio (5, 10),
# stream length (15), TF stats (25-45), normalized-TF stats (50-70),
# TF-IDF stats (75-95), BM25 (110), URL (126, 127), links (128, 129),
# PageRank (130). 24 ids total.
MSLR_FEATURE_IDS = [
    5, 10, 15, 25, 30, 35, 40, 45, 50, 55,
    60, 65, 70, 75, 80, 85, 90, 95, 110, 126,
    127, 128, 129, 130,
]


def datagen(
    spark: SparkSession,
    letor_path: str,
    out_path: str,
    max_examples: int = 1_000_000,
    min_diff: int = 3,
    feature_ids: list[int] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """E2: LETOR file -> sampled pairwise-difference examples on disk.

    Output columns: label, d_f<id>... — the reference's CSV puts label
    LAST after 24 feature diffs (data_loader.go:96-117); we keep that
    order in the CSV sink for drop-in compatibility."""
    if not 1 <= min_diff <= 4:
        raise ValueError("min_diff must be in 1..4")  # cmd/datagen/main.go:28-30
    ids = feature_ids or MSLR_FEATURE_IDS
    lines = spark.read.text(letor_path).withColumnRenamed("value", "line")
    parsed = ltr.parse_letor(lines, ids)
    fcols = [f"f{i}" for i in ids]
    pairs = ltr.pairwise_examples(parsed, fcols, min_diff=min_diff)
    sampled = ltr.sample_deterministic(pairs, max_examples, ["qid", "i", "j"])
    out = sampled.select(*[f"d_{c}" for c in fcols], "label")
    if fmt == "csv":
        out.write.mode("overwrite").option("header", True).csv(out_path)
    else:
        out.write.mode("overwrite").parquet(out_path)
    return out


def train(
    spark: SparkSession,
    examples_path: str,
    cv_grid: list[float] | None = None,
    fmt: str = "parquet",
    model_dir: str | None = None,
    model: str = "lr",
    test_frac: float = 0.0,
    seed: int = 42,
    train_kw: dict | None = None,
) -> dict:
    """E3: examples -> trained model -> confusion + accuracy.

    ``model``: "lr" = M1 logistic regression (+optional M3 CV over
    ``cv_grid``); "residual_mlp" = M4 with the reference's exact
    architecture (six residual blocks, GELU/LayerNorm/BatchNorm/Dropout,
    AdamW + label smoothing + plateau schedule, training/nn_model.py:4-39,
    train.py:10-84) implemented in numpy —
    :func:`..operators.residual_mlp.fit_residual_reranker`: scaler stats
    and inference distributed, gradient loop driver-side like the
    reference's single-node trainer; "mlp" = the lighter MLlib
    feed-forward stand-in (:func:`..operators.ltr.train_pairwise_mlp`),
    trained fully distributed via L-BFGS; "gbt" = the LambdaMART-family
    gradient-boosted-trees trainer
    (:func:`..operators.ltr.train_pairwise_gbt`), distributed
    histogram-based boosting.

    ``test_frac`` > 0 holds out a seeded random split and reports
    ``test_accuracy`` separately (the reference reports held-out test
    accuracy, test.py:69-84 — 81.92% for the published model).

    ``model_dir`` persists the fitted pipeline via MLlib's native
    writer (S11 — the reference saves best_model.pth / scaler.joblib,
    training/train.py:75,114-115; MLlib bundles scaler+model in one
    artifact reloadable with PipelineModel.load).

    Returns {model, confusion: {(label, prediction): n}, accuracy
    [, test_accuracy]}; confusion/accuracy are over the training split."""
    if fmt == "csv":
        df = spark.read.option("header", True).option("inferSchema", True).csv(examples_path)
    else:
        df = spark.read.parquet(examples_path)
    fcols = [c for c in df.columns if c != "label"]
    if test_frac > 0:
        train_df, test_df = df.randomSplit([1.0 - test_frac, test_frac], seed=seed)
    else:
        train_df, test_df = df, None
    if model == "residual_mlp":
        from ..operators.residual_mlp import fit_residual_reranker

        fitted, _hist = fit_residual_reranker(
            train_df, fcols, seed=seed, **(train_kw or {})
        )
        if model_dir:
            fitted.save(f"{model_dir}/residual_mlp.npz")

        def _score(part: DataFrame) -> DataFrame:
            return fitted.transform(part).withColumn(
                "pred_label", (F.col("prediction") * 2 - 1).cast("int")
            )

    else:
        if model == "mlp":
            fitted = ltr.train_pairwise_mlp(train_df, fcols, seed=seed)
        elif model == "gbt":
            fitted = ltr.train_pairwise_gbt(
                train_df, fcols, seed=seed, **(train_kw or {})
            )
        else:
            fitted = ltr.train_pairwise_lr(train_df, fcols, cv_grid=cv_grid)
        if model_dir:
            fitted.write().overwrite().save(model_dir)

        def _score(part: DataFrame) -> DataFrame:
            return fitted.transform(
                part.withColumn("_y", ((F.col("label") + 1) / 2).cast("double"))
            ).withColumn("pred_label", (F.col("prediction") * 2 - 1).cast("int"))

    scored = _score(train_df)
    cm_df = ltr.confusion_matrix(scored, label_col="label", pred_col="pred_label")
    confusion = {(r.label, r.pred_label): r.n for r in cm_df.collect()}
    out = {
        "model": fitted,
        "confusion": confusion,
        "accuracy": ltr.accuracy(scored, label_col="label", pred_col="pred_label"),
    }
    if test_df is not None:
        out["test_accuracy"] = ltr.accuracy(
            _score(test_df), label_col="label", pred_col="pred_label"
        )
    return out
