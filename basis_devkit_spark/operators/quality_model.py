"""Trained quality filtering — the fastText-classifier stage of a
pretraining pipeline (GPT-3/LLaMA-style: score every document against a
"high quality" reference class, keep by threshold or importance-sample).

Spark-first: Tokenizer → HashingTF (feature hashing, no vocabulary state)
→ LogisticRegression, all Spark ML — the model is a broadcastable set of
coefficients and scoring is a JVM-side vector dot product, no Python in
the hot path. Training runs on a bounded sample (fitting on 100 TB is
never the right call; classifier quality saturates long before).

No reference parity to cite: the reference devkit has no ML surface —
this is part of the beyond-reference LLM-pipeline layer (SURVEY §2.D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 12,
    max_iter: int = 30,
    reg_param: float = 0.01,
    max_train_rows: int = 500_000,
    seed: int = 42,
):
    """Fit the hashed-BoW logistic quality model on (text, 0/1 label)
    rows. Returns a PipelineModel whose ``transform`` adds
    ``quality_prob`` (P(label=1)). Training is capped at
    ``max_train_rows`` via a seeded sample."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    n = df.count()
    train = (
        df.sample(fraction=min(1.0, 1.1 * max_train_rows / n), seed=seed)
        if n > max_train_rows
        else df
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+"
            ),
            HashingTF(
                inputCol="__toks", outputCol="__feat", numFeatures=num_features
            ),
            LogisticRegression(
                featuresCol="__feat",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
                probabilityCol="__prob",
                rawPredictionCol="__raw",
                predictionCol="__pred",
            ),
        ]
    )
    model = pipe.fit(train)
    # Strip the training summary before handing the model out: the fitted
    # LogisticRegressionModel keeps a NON-transient reference to its
    # summary, which references the SparkSession — so any task closure
    # that captures the model drags the session (and its non-serializable
    # ObservationManager) into task serialization and scoring dies with
    # "Task not serializable" (observed whenever the session has touched
    # certain catalog paths). Persist/reload drops the summary (summaries
    # are never saved) — the exact shape of production scoring from a
    # saved artifact.
    import shutil
    import tempfile

    from pyspark.ml import PipelineModel

    path = tempfile.mkdtemp(prefix="bds_qm_")
    try:
        model.write().overwrite().save(path + "/model")
        return PipelineModel.load(path + "/model")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def score_quality(model, df: DataFrame, keep_threshold: float | None = None) -> DataFrame:
    """Score documents with a trained quality model: adds
    ``quality_prob``; with ``keep_threshold`` also filters to rows at or
    above it. Pure model projection — coefficient vector broadcast with
    the plan, no shuffle, no Python."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df).withColumn(
        "quality_prob",
        F.round(vector_to_array(F.col("__prob")).getItem(1), 6),
    ).drop("__toks", "__feat", "__prob", "__raw", "__pred")
    if keep_threshold is not None:
        scored = scored.filter(F.col("quality_prob") >= keep_threshold)
    return scored
