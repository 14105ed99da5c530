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

from basis_devkit_spark.session import local_relation


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


# -------------------------------------------- deterministic variant (d24)


def fit_hashed_logreg(
    rows: list[tuple[str, int]],
    num_features: int = 1024,
    iters: int = 60,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> tuple[list[int], float]:
    """Bit-reproducible hashed-BoW logistic fit — the trained-classifier
    analogue of ``deterministic_kmeans`` (d03d): full-batch float64
    gradient descent over an ORDERED driver-side sample, no randomness,
    no cross-partition reduction, so the fitted coefficients are
    identical across processes and engines. ``rows`` = (text, 0/1 label)
    in a deterministic order (callers pass the first-N-by-id sample).

    Features: token → ``xxhash64(token) mod num_features`` bucket counts
    — the SAME public-spec hash the distributed scoring expression uses
    (pyoracle.xxh64_str is the proven Python model of Spark's xxhash64),
    so fit-side and score-side features agree exactly.

    Returns ``(wq, bias)`` where ``wq[j] = floor(w[j] * 1e9)`` as exact
    ints — the integerize-before-reduce contract of
    :func:`score_hashed_logreg`: sharing the QUANTIZED weights makes the
    distributed score an exact integer sum (associative, engine- and
    partitioning-independent), leaving one division, one addition and
    one ``exp`` per document as the only float ops."""
    import math
    import re

    import numpy as np

    from basis_devkit_spark.queries.pyoracle import xxh64_str

    ws = re.compile(r"\s+")
    n = len(rows)
    if n == 0:
        raise ValueError("fit_hashed_logreg needs a non-empty sample")
    X = np.zeros((n, num_features), dtype=np.float64)
    y = np.zeros(n, dtype=np.float64)
    for i, (text, label) in enumerate(rows):
        y[i] = float(label)
        for t in ws.split((text or "").strip().lower()):
            X[i, xxh64_str(t) % num_features] += 1.0
    w = np.zeros(num_features, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (p - y) / n + l2 * w
        w -= lr * g
        b -= lr * float(np.mean(p - y))
    return [int(math.floor(float(x) * 1e9)) for x in w], float(b)


def score_hashed_logreg(
    df: DataFrame,
    wq: list[int],
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1024,
    score_round: int = 6,
) -> DataFrame:
    """Distributed scoring against a :func:`fit_hashed_logreg` model:
    ``(id, quality_prob)``. Exactness at scale: each token's weight is
    the pre-quantized LONG ``wq[bucket]``, so the per-doc aggregation is
    an exact integer sum (map-side combinable, bit-identical under any
    partitioning); ``z = sum/1e9 + bias`` and the sigmoid are the only
    float ops, rounded to ``score_round`` for the oracle contract. The
    weight table rides as a broadcast RELATION (num_features rows), not
    plan literals — flat compile time, the `_with_cell_ranks` rule."""
    spark = df.sparkSession
    wdf = local_relation(
        spark, [(int(i), int(v)) for i, v in enumerate(wq)],
        "bucket int, wq long",
    )
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ex = df.select(F.col(id_col), F.explode(toks).alias("__t")).select(
        id_col,
        F.pmod(F.xxhash64("__t"), F.lit(num_features)).cast("int").alias("bucket"),
    )
    s = (
        ex.join(F.broadcast(wdf), "bucket")
        .groupBy(id_col)
        .agg(F.sum("wq").alias("__swq"))
    )
    z = F.col("__swq").cast("double") / F.lit(1e9) + F.lit(float(bias))
    return s.select(
        id_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), score_round).alias(
            "quality_prob"
        ),
    )


# --------------------------------------- multiclass language ID (d39)


def _char_bigrams_col(text_col: str):
    """Character-bigram array of ``lower(trim(text))`` — the language-ID
    feature (character statistics carry the language signal; token
    hashing would need a per-language vocabulary). Spark ``substring``
    is codepoint-based, so a Python ``s[i:i+2]`` loop over the same
    string is the exact model."""
    s = F.lower(F.trim(F.col(text_col)))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - 1),
        lambda i: F.substring(s, i, 2),
    )
    return F.when(F.length(s) >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def fit_hashed_softmax(
    rows: list[tuple[str, int]],
    num_classes: int,
    num_features: int = 1024,
    iters: int = 60,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> tuple[list[tuple[int, int, int]], list[int]]:
    """Bit-reproducible hashed char-bigram SOFTMAX fit — the multiclass
    analogue of :func:`fit_hashed_logreg` (same d24 deterministic-fit
    contract: full-batch float64 GD over an ORDERED driver-side sample,
    no randomness, one numpy/BLAS runtime). ``rows`` = (text, class_idx)
    with class_idx in [0, num_classes).

    Returns ``(weight_rows, bq)``: ``weight_rows`` =
    [(bucket, cls, floor(w*1e9))] for EVERY (bucket, cls) —
    num_features × num_classes rows, the broadcastable artifact — and
    ``bq[c] = floor(bias_c * 1e9)``. Quantizing BOTH weights and biases
    makes the distributed argmax an exact INTEGER comparison
    (engine/partition-invariant), the integerize-before-reduce rule."""
    import math

    import numpy as np

    from basis_devkit_spark.queries.pyoracle import xxh64_str

    n = len(rows)
    if n == 0:
        raise ValueError("fit_hashed_softmax needs a non-empty sample")
    X = np.zeros((n, num_features), dtype=np.float64)
    Y = np.zeros((n, num_classes), dtype=np.float64)
    for i, (text, cls) in enumerate(rows):
        Y[i, int(cls)] = 1.0
        s = (text or "").strip(" ").lower()
        for j in range(len(s) - 1):
            X[i, xxh64_str(s[j : j + 2]) % num_features] += 1.0
    W = np.zeros((num_features, num_classes), dtype=np.float64)
    b = np.zeros(num_classes, dtype=np.float64)
    for _ in range(iters):
        z = X @ W + b
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        p = e / e.sum(axis=1, keepdims=True)
        G = X.T @ (p - Y) / n + l2 * W
        W -= lr * G
        b -= lr * (p - Y).mean(axis=0)
    weight_rows = [
        (j, c, int(math.floor(float(W[j, c]) * 1e9)))
        for j in range(num_features)
        for c in range(num_classes)
    ]
    bq = [int(math.floor(float(x) * 1e9)) for x in b]
    return weight_rows, bq


def score_hashed_softmax(
    df: DataFrame,
    weight_rows: list[tuple[int, int, int]],
    bq: list[int],
    classes: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1024,
) -> DataFrame:
    """Distributed multiclass scoring against a
    :func:`fit_hashed_softmax` model: ``(id, lang)`` with ``lang`` =
    ``classes[argmax_c(Σ wq[bucket,c] + bq[c])]`` — an EXACT integer
    argmax (quantized weights and biases, associative integer sums;
    ties break to the smallest class index via struct-min). The weight
    table rides as a broadcast relation (num_features × num_classes
    rows); per doc the plan is explode char bigrams → broadcast join →
    one hash agg → struct-min argmax. Docs with no bigrams get the
    bias-only argmax."""
    spark = df.sparkSession
    wdf = local_relation(
        spark,
        [(int(bkt), int(c), int(v)) for bkt, c, v in weight_rows],
        "bucket int, cls int, wq long",
    )
    bias_default = min((-v, c) for c, v in enumerate(bq))[1]
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_char_bigrams_col(text_col)).alias("__g"),
    ).select(
        "__id",
        F.pmod(F.xxhash64("__g"), F.lit(num_features)).cast("int").alias(
            "bucket"
        ),
    )
    bdf = local_relation(
        spark, [(int(c), int(v)) for c, v in enumerate(bq)],
        "cls int, bq long",
    )
    scored = (
        ex.join(F.broadcast(wdf), "bucket")
        .groupBy("__id", "cls")
        .agg(F.sum("wq").alias("__s"))
        .join(F.broadcast(bdf), "cls")
        .groupBy("__id")
        .agg(
            F.min(
                F.struct(
                    (-(F.col("__s") + F.col("bq"))).alias("ns"),
                    F.col("cls").alias("cls"),
                )
            )["cls"].alias("__cls")
        )
    )
    cls_map = F.array(*[F.lit(c) for c in classes])
    return df.select(F.col(id_col)).join(
        scored.withColumnRenamed("__id", id_col), id_col, "left"
    ).select(
        id_col,
        F.element_at(
            cls_map, F.coalesce(F.col("__cls"), F.lit(bias_default)) + 1
        ).alias("lang"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Classifier calibration report — the reliability-diagram table
    every production quality filter ships with: bucket predicted
    scores into ``n_bins`` equal-width bins and report, per bin, the
    count, positive count, mean predicted score, and observed positive
    rate. A well-calibrated filter has ``pos_rate ≈ mean_score`` per
    bin; a gap says the threshold the curation pipeline applies does
    not mean what it claims.

    One hash aggregate over the scored relation. Cross-engine
    exactness: the mean goes through a DECIMAL(27,6) sum of the (6dp-
    rounded) scores before one double division, and mean/rate are
    floor-scaled at 1e6 — identical doubles both engines. Scores
    exactly 1.0 land in the top bin."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    r6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
            F.sum(s.cast("decimal(27,6)")).alias("__ssum"),
        )
        .select(
            "bin",
            "n",
            F.col("n_pos").cast("long").alias("n_pos"),
            r6(F.col("__ssum").cast("double") / F.col("n")).alias(
                "mean_score"
            ),
            r6(F.col("n_pos").cast("double") / F.col("n")).alias(
                "pos_rate"
            ),
        )
    )


def calibration_bin_state(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Mergeable per-bin calibration state ``(bin, n, n_pos, ssum)`` —
    the partial form of :func:`calibration_bins` for streaming
    maintenance (c16/c27 ``stream_merge_to_store`` pattern): counts are
    integer SUMs and the score sum is an exact DECIMAL(27,6) sum, so
    states built per micro-batch and added key-wise equal the one-shot
    state bit-for-bit (integer/decimal addition is associative — no
    float drift across batch boundaries)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    return df.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(label_col).cast("long")).cast("long").alias("n_pos"),
        F.sum(s.cast("decimal(27,6)")).cast("decimal(27,6)").alias("ssum"),
    )


def calibration_bins_from_state(state: DataFrame) -> DataFrame:
    """Finalize a (merged) :func:`calibration_bin_state` relation into
    the :func:`calibration_bins` report shape — the same floor-scaled
    arithmetic, so a report read from streamed state equals the
    one-shot report byte-for-byte (the c32 oracle contract)."""
    r6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0
    return state.select(
        "bin",
        "n",
        F.col("n_pos").cast("long").alias("n_pos"),
        r6(F.col("ssum").cast("double") / F.col("n")).alias("mean_score"),
        r6(F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
    )
