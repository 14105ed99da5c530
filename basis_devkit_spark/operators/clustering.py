"""Distributed k-means corpus clustering — the topic-structure pass a
training-data pipeline runs over document embeddings (cluster-balanced
mixing, per-topic quality audits, SemDeDup-style pruning all start from
"which cluster is this doc in").

Reference parity: the reference exposes clustering only as a black-box
model step; here it is a first-class, bit-reproducible DataFrame
operator (reference ``node.py`` declares the model-fit hook; this is
the Spark-native realization).

Two k-means live in this repo on purpose:

- ``similarity.deterministic_kmeans`` — DRIVER-side Lloyd over a
  bounded sample, used to fit quantizer codebooks (IVF cells, PQ
  codebooks) where the sample-bound is part of the design.
- THIS module — full-corpus DISTRIBUTED Lloyd: every row is assigned
  every iteration; only the k×dim centroid relation ever reaches the
  driver.

Determinism contract (what makes the fit reproducible at any
parallelism): init is the k lowest-id vectors (no RNG); per-row
assignment distances are SEQUENTIAL left folds over the dimension axis
(identical FP order on every engine); centroid means are
DECIMAL(18,9)-exact (integer arithmetic — partition order cannot change
a ulp) and rounded to ``centroid_round`` decimals before the next
iteration, so every iteration's inputs are identical doubles no matter
how the data was partitioned. Ties in assignment break to the lowest
cluster index. Empty clusters keep their previous centroid.

Scale shape: per iteration, one scan + one (cluster, pos)-keyed hash
aggregate (map-side combinable; result is k×dim rows) — no shuffle of
the vectors themselves, no Python. Centroids are inlined as plan
literals (k×dim doubles), which keeps assignment inside whole-stage
codegen; past k×dim ≈ 10⁵ switch the assignment to a broadcast join
against a centroid relation (the d20 IVF shape) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_sq(vec_col, centroid: list[float]):
    """Squared L2 distance as a sequential left fold over dimensions —
    (0 + t0) + t1 + ... so the FP addition order is engine-independent."""
    clit = F.array(*[F.lit(float(c)) for c in centroid])
    terms = F.zip_with(
        vec_col,
        clit,
        # one subtraction + one multiplication — NOT pow(), so both
        # engines perform the identical correctly-rounded operations
        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
    )
    return F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)


def kmeans_assign(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Assign every row to its nearest centroid (squared L2, ties to the
    lowest cluster index). Adds ``cluster`` (int) and ``dist_sq``
    (double). Pure projection — centroids are plan literals, assignment
    stays in whole-stage codegen."""
    v = F.col(vec_col)
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist_sq(v, c).alias("d"), F.lit(j).alias("j")
                )
                for j, c in enumerate(centroids)
            ]
        )
    )
    return df.withColumn("__best", best).select(
        "*",
        F.col("__best.j").alias("cluster"),
        F.col("__best.d").alias("dist_sq"),
    ).drop("__best")


def kmeans_fit_predict(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    centroid_round: int = 6,
) -> tuple[DataFrame, list[list[float]]]:
    """Full-corpus distributed Lloyd: deterministic init (the ``k``
    lowest-``id_col`` vectors), then ``iters`` rounds of assign →
    DECIMAL-exact per-dimension mean → round. Returns the final
    assignment frame (input columns + ``cluster``/``dist_sq`` against
    the FINAL centroids) and the centroid list.

    Only k×dim doubles are ever collected per iteration — the same
    bounded-artifact budget as the IVF/PQ codebook fits."""
    if k < 1:
        raise ValueError("need k >= 1")
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    cents: list[list[float]] = [
        [float(x) for x in r[vec_col]] for r in init_rows
    ]
    for _ in range(int(iters)):
        asg = kmeans_assign(df, vec_col, cents)
        ex = asg.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        mean = F.round(
            F.sum(
                F.col("x").cast("double").cast("decimal(18,9)")
            ).cast("double")
            / F.count(F.lit(1)),
            centroid_round,
        )
        stats = (
            ex.groupBy("cluster", "pos").agg(mean.alias("cv")).collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["cv"]
        cents = [
            [d[p] for p in sorted(d)] if (d := by_cluster.get(j)) else c
            for j, c in enumerate(cents)
        ]
    return kmeans_assign(df, vec_col, cents), cents


def kmeans_cluster_report(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    label_col: str | None = None,
    centroid_round: int = 6,
    out_round: int = 6,
) -> DataFrame:
    """Per-cluster corpus profile after :func:`kmeans_fit_predict`:
    ``(cluster, n_vecs, inertia, majority_label, purity)``. Inertia is
    the DECIMAL-exact sum of squared distances to the final centroid
    (floor-scaled ``out_round``); majority label breaks count ties to
    the lowest label; purity = majority count / cluster size. Clusters
    that ended empty report ``n_vecs = 0`` with NULL label/purity —
    never silently dropped."""
    asg, cents = kmeans_fit_predict(
        df, id_col, vec_col, k=k, iters=iters, centroid_round=centroid_round
    )
    scale = float(10 ** out_round)
    base = asg.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        (
            F.floor(
                F.sum(F.col("dist_sq").cast("decimal(18,9)"))
                .cast("double") * scale + 0.5
            ) / scale
        ).alias("inertia"),
    )
    spine = asg.sparkSession.range(len(cents)).select(
        F.col("id").cast("int").alias("cluster")
    )
    if label_col is not None:
        lc = asg.groupBy("cluster", label_col).agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
        maj = lc.groupBy("cluster").agg(
            F.min(
                F.struct(
                    (-F.col("__n")).alias("neg"),
                    F.col(label_col).alias("lab"),
                )
            ).alias("__m")
        ).select(
            "cluster",
            F.col("__m.lab").alias("majority_label"),
            (-F.col("__m.neg")).cast("long").alias("__maj_n"),
        )
        base = base.join(maj, "cluster", "left").withColumn(
            "purity",
            F.floor(
                F.col("__maj_n").cast("double") / F.col("n_vecs") * scale
                + 0.5
            ) / scale,
        ).drop("__maj_n")
    return (
        spine.join(base, "cluster", "left")
        .withColumn("n_vecs", F.coalesce("n_vecs", F.lit(0).cast("long")))
        .withColumn(
            "inertia",
            F.when(F.col("n_vecs") > 0, F.col("inertia")).otherwise(
                F.lit(0.0)
            ),
        )
    )


def cluster_top_terms(
    assign: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_col: str = "cluster",
    k_terms: int = 5,
    out_round: int = 6,
) -> DataFrame:
    """Topic labels for clusters (the c-TF-IDF idea, public — Grootendorst
    2022): score each term within a cluster by
    ``count · log2((1 + n_clusters) / (1 + df))`` where ``df`` is the
    number of clusters containing the term, and keep the top
    ``k_terms`` per cluster — terms frequent HERE and rare elsewhere.
    This is what turns an opaque k-means report (sizes, inertia) into
    "cluster 3 is legal boilerplate". Returns
    ``(cluster, term_rank, term, n_occurrences, score)``.

    Parity contract: counts and cluster-df are integers; both log2
    inputs are integers, DECIMAL(18,9)-rounded (the d60 wobble
    absorber), so every score is an identical double and the
    (score desc, term) ranking is engine-independent.

    Scale shape: one explode + (cluster, term) map-side-combinable
    count + a term-keyed df agg; the final top-k is a rank-only window
    partitioned by cluster (integer state, no buffering — the d65
    justification); clusters are few by construction, the vocabulary
    never sorts globally."""
    from pyspark.sql import Window

    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    joined = assign.select(
        F.col(id_col).alias("__id"), F.col(cluster_col).alias("cluster")
    ).join(
        docs.select(F.col(id_col).alias("__id"), F.col(text_col)), "__id"
    )
    ex = joined.select(
        "cluster", F.explode(toks).alias("term")
    ).filter(F.col("term") != "")
    tf = ex.groupBy("cluster", "term").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    dfc = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    n_clusters = assign.select(cluster_col).distinct().count()
    tl = lambda c: (
        F.log2(c.cast("double")).cast("decimal(18,9)").cast("double")
    )
    score = F.col("n_occurrences").cast("double") * (
        tl(F.lit(1 + int(n_clusters))) - tl(F.col("__df") + 1)
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("__score").desc(), "term"
    )
    scale = float(10 ** out_round)
    return (
        tf.join(dfc, "term")
        .withColumn("__score", score)
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= int(k_terms))
        .select(
            "cluster", "term_rank", "term", "n_occurrences",
            (F.floor(F.col("__score") * scale + 0.5) / scale).alias(
                "score"
            ),
        )
    )
