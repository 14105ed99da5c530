"""Embedding-column utilities beyond similarity search (SURVEY §2.D D6):
quantization and corpus-level statistics — the storage/bandwidth side of
running vector workloads at 100 TB.

All pure array HOF expressions; int8 quantization cuts vector storage 4×
(and shuffle bytes with it), which at petabyte embedding scale is the
difference between a feasible job and not.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q = round(x * 127 / amax),
    stored with its scale for dequantization. Adds ``{out}_q`` (array<int>)
    and ``{out}_scale`` (double)."""
    out = out_col or vec_col
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(vd, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / 127.0).otherwise(F.lit(1.0))
    # let-bind the scale (exprs.let_): referenced inline inside the
    # per-element lambda it would re-reduce the whole vector for every
    # component — O(dim²) per row under interpreted HOFs.
    from basis_devkit_spark.operators.exprs import let_

    q = let_(
        scale, lambda s: F.transform(vd, lambda x: F.round(x / s).cast("int"))
    )
    return df.withColumn(f"{out}_q", q).withColumn(f"{out}_scale", scale)


def dequantize_int8(
    df: DataFrame, q_col: str, scale_col: str, out_col: str
) -> DataFrame:
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda v: v.cast("double") * F.col(scale_col)),
    )


def quantization_error(
    df: DataFrame, vec_col: str = "embedding", k: int = 0
) -> DataFrame:
    """Per-vector max absolute reconstruction error of int8 quantization —
    the acceptance metric for a quantized index."""
    q = quantize_int8(df, vec_col)
    deq = dequantize_int8(q, f"{vec_col}_q", f"{vec_col}_scale", "__deq")
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    err = F.array_max(
        F.zip_with(vd, F.col("__deq"), lambda a, b: F.abs(a - b))
    )
    return deq.withColumn("max_abs_err", err).drop("__deq")


def corpus_embedding_stats(
    df: DataFrame, vec_col: str = "embedding", by: str | None = None
) -> DataFrame:
    """Corpus-level embedding statistics (per group if ``by``): count,
    mean/min/max L2 norm, dimension. One aggregation pass."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x))
    base = df.select(
        *( [F.col(by)] if by else [] ),
        norm.alias("__norm"),
        F.size(vec_col).alias("__dim"),
    )
    keys = [by] if by else []
    return base.groupBy(*keys).agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("__norm"), 4).alias("mean_norm"),
        F.round(F.min("__norm"), 4).alias("min_norm"),
        F.round(F.max("__norm"), 4).alias("max_norm"),
        F.max("__dim").alias("dim"),
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid vectors: element-wise mean over each label's
    embeddings. posexplode → one (label, pos) hash agg (decimal-exact
    sums) → order-preserving re-pack via array_sort over (pos, mean)
    structs — no windows, no UDFs. The classic class-prototype /
    nearest-centroid-classifier building block.
    """
    pos = df.select(
        F.col(label_col).alias("__l"),
        F.posexplode(F.col(vec_col)).alias("__p", "__v"),
    )
    means = pos.groupBy("__l", "__p").agg(
        (
            F.sum(F.col("__v").cast("double").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__m")
    )
    return (
        means.groupBy("__l")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__m"))),
                lambda s: s.getField("__m"),
            ).alias("centroid")
        )
        .select(F.col("__l").alias(label_col), "centroid")
    )


def embedding_standardize_fit(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension standardization fit — the feature-normalization
    step before clustering/classification: for each vector position,
    mean and sample stddev derived from DECIMAL-EXACT sums (the sigma
    formula evaluates in float64 from exact sums, so both engines
    compute bit-identical results; explicit IEEE rounding on output).
    Returns (pos, mu, sigma) — apply downstream as (v - mu) / sigma
    with a broadcast of these 64-ish rows.
    """
    pos = df.select(F.posexplode(F.col(vec_col)).alias("__p", "__v"))
    agg = pos.groupBy("__p").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__v").cast("double").cast("decimal(18,9)")).cast("double").alias("__s"),
        F.sum(
            (F.col("__v").cast("double").cast("decimal(18,9)")
             * F.col("__v").cast("double").cast("decimal(18,9)"))
        )
        .cast("double")
        .alias("__sq"),
    )
    mu = F.col("__s") / F.col("__n")
    var = (F.col("__sq") - F.col("__s") * F.col("__s") / F.col("__n")) / (
        F.col("__n") - 1
    )
    r6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        (F.col("__p") + 1).cast("int").alias("pos"),
        r6(mu).alias("mu"),
        r6(F.sqrt(var)).alias("sigma"),
    )


def nearest_centroid_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_col: str = "centroid",
) -> DataFrame:
    """Nearest-centroid classification (Rocchio): assign each vector to
    the centroid with the highest cosine similarity. The centroid table
    (one row per class — tiny) collects to literal arrays and the whole
    scoring is a pure per-row expression chain: no join, no shuffle, no
    UDF; ties break toward the lexicographically smallest label.
    Adds ``pred_label``.
    """
    rows = centroids.select(label_col, centroid_col).collect()
    if not rows:
        raise ValueError("empty centroid table")
    v = F.col(vec_col)
    vnorm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    best = None
    for r in sorted(rows, key=lambda r: str(r[label_col])):
        c = F.array(*[F.lit(float(x)) for x in r[centroid_col]])
        dot = F.aggregate(
            F.zip_with(v, c, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
        )
        cn = math.sqrt(sum(float(x) * float(x) for x in r[centroid_col])) or 1.0
        score = dot / (vnorm * cn)
        entry = F.struct(score.alias("s"), F.lit(str(r[label_col])).alias("l"))
        best = entry if best is None else F.when(score > best["s"], entry).otherwise(best)
    return df.withColumn("pred_label", best["l"])


def nearest_centroid_assign_join(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_col: str = "centroid",
    margin: float | None = None,
) -> DataFrame:
    """Nearest-centroid assignment, RELATIONAL form: posexplode vectors,
    broadcast-join the (label, pos, weight) centroid table, hash-agg the
    per-(row, label) dot products, then ``max_by`` argmax. No large
    literal expressions (compile cost flat in class count) — the form
    that scales to thousands of classes; ties break toward the smallest
    label via the (score, label) ordering struct. Adds ``pred_label``.

    ``margin``: when set, rows whose top-2 score separation is below
    ``margin × max(|v|, 1e-12)`` are DROPPED from the output — the
    float-argmax boundary gate. Dot products are float sums whose
    engine-specific summation order perturbs scores at ~1e-15 relative;
    an exact tie (symmetric/duplicate vectors) can therefore argmax
    differently across engines. Gating on a scale-normalized margin
    (≫ the perturbation, ≪ any genuine separation) makes the
    prediction set engine-reproducible and oracle-checkable; boundary
    rows are the caller's to handle (here: excluded, quality covered by
    the accuracy pytest).
    """
    cw = centroids.select(
        F.col(label_col).cast("string").alias("__cl"),
        F.posexplode(F.col(centroid_col)).alias("__p", "__w"),
    )
    cnorm = cw.groupBy("__cl").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__cn")
    )
    ve = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col)).alias("__p", "__v"),
    )
    dots = (
        ve.join(F.broadcast(cw), "__p")
        .groupBy("__id", "__cl")
        .agg(F.sum(F.col("__v") * F.col("__w")).alias("__dot"))
        .join(F.broadcast(cnorm), "__cl")
    )
    # |v| is a per-row constant across labels: it cannot change the argmax,
    # so score = dot/|c| suffices (and skips a second vector pass)
    # min_by over (-score, label): max score first, smallest label on ties
    scored = dots.withColumn("__s", F.col("__dot") / F.col("__cn"))
    aggs = [
        F.min_by(
            F.col("__cl"),
            F.struct((-F.col("__s")).alias("s"), F.col("__cl").alias("l")),
        ).alias("pred_label")
    ]
    if margin is not None:
        # top-2 scores: k-element sorted array per row (k = class count,
        # small by construction — this is a centroid classifier)
        aggs.append(F.sort_array(F.collect_list("__s"), False).alias("__ss"))
    pred = scored.groupBy("__id").agg(*aggs)
    if margin is not None:
        vn = ve.groupBy("__id").agg(
            F.sqrt(
                F.sum(F.col("__v").cast("double") * F.col("__v").cast("double"))
            ).alias("__vn")
        )
        s1 = F.get(F.col("__ss"), 0)
        s2 = F.get(F.col("__ss"), 1)  # null for single-class edge case
        pred = (
            pred.join(vn, "__id")
            .filter(
                s2.isNull()
                | ((s1 - s2) > F.lit(margin) * F.greatest(F.col("__vn"), F.lit(1e-12)))
            )
            .drop("__ss", "__vn")
        )
    return df.join(
        pred.withColumnRenamed("__id", id_col), id_col
    )


def jl_project(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "jl",
    out_dim: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection with a DETERMINISTIC
    hashed ±1 sign matrix (Achlioptas 2001 database-friendly
    construction — public method): ``out[j] = Σ_i s(j,i) · v[i]`` with
    ``s(j,i) = ±1`` from ``xxhash64(j·2^20 + i, seed)`` parity. The
    dimension cut (64 → 16 here) shrinks every downstream shuffle,
    cache, and ANN-candidate distance 4×; distances are preserved within
    the JL distortion bound in expectation.

    Exactness contract (the repo's integerization pattern): components
    are computed as EXACT INTEGER sums of the ±(value·10⁹) longs derived
    from the float32 inputs via the established
    ``cast(double)·cast(decimal(18,9))`` path — no float op in the fold,
    so the result is order/partition/engine-invariant and exact-hash
    oracled. ``{out_col}`` is the long array (scale 10⁹);
    ``{out_col}_f`` the double view for geometry.

    100 TB: a PURE PROJECTION — no shuffle, no UDF, no fit artifact
    (the "matrix" is a hash function); composable with quantize_int8
    and the IVF/PQ index builds on the reduced vectors.

    The scaled-long array materializes once per row in its own
    projection: higher-order functions run interpreted, so an inlined
    transform() would re-build the whole decimal-cast array for every
    element_at inside the component folds (~2k rebuilds per row)."""
    vlong_col = f"__jl_vlong_{out_col}"
    vlong = F.col(vlong_col)
    d = F.size(F.col(vec_col))
    # loud rail (the fit_pq_codebook/jl_topk pattern): |x| ≥ 1e9
    # overflows the decimal(18,9) cast to a silent NULL, and
    # Σ|x·10⁹| ≥ 2⁶² could wrap the integer fold — refuse both rather
    # than diverge quietly. Real embedding components are O(1).
    # NULL vectors pass through (forall over a null array is NULL and
    # assert_true(NULL) throws): OR the null case into the condition,
    # mirroring quantize_codes' guard, so null embeddings project to
    # null output instead of aborting every consumer.
    guard = F.assert_true(
        F.col(vec_col).isNull()
        | F.forall(
            F.col(vec_col),
            lambda x: (F.abs(x.cast("double")) < F.lit(1e9))
            & (F.abs(x.cast("double")) * d.cast("double") < F.lit(4.6e9)),
        ),
        F.lit(
            "jl_project: input component magnitude exceeds the exact-"
            "integer rails (|x| < 1e9 and |x|*dim < 4.6e9)"
        ),
    )

    # Signed-sum component: build the ±1 row of the hashed sign matrix,
    # multiply elementwise, fold. vlong appears ONCE per component (not
    # once per element_at), so even when an optimizer rule duplicates
    # the whole projection expression (InferFiltersFromGenerate pushes a
    # size()>0 filter below the materializing Project), the re-evaluated
    # copy stays linear instead of quadratic in the input dimension.
    def comp(j: Column) -> Column:
        signs = F.transform(
            F.sequence(F.lit(0), d - 1),
            lambda i: F.when(
                F.pmod(
                    F.xxhash64(
                        (
                            F.lit(seed).cast("long") * F.lit(1 << 40)
                            + j.cast("long") * F.lit(1 << 20)
                            + i.cast("long")
                        )
                    ),
                    F.lit(2),
                )
                == 0,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long")),
        )
        return F.aggregate(
            F.zip_with(vlong, signs, lambda v, s: v * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    jl = F.transform(F.sequence(F.lit(0), F.lit(out_dim - 1)), comp)
    # guard is NULL when the rail passes; null inputs yield null output
    # (not an array of null components) so downstream null-tolerant
    # guards (quantize_codes) see them the same way they see null vecs.
    jl = F.when(guard.isNull() & F.col(vec_col).isNotNull(), jl)
    return (
        df.withColumn(
            vlong_col,
            F.transform(
                F.col(vec_col),
                lambda x: (
                    x.cast("double").cast("decimal(18,9)") * 1_000_000_000
                ).cast("long"),
            ),
        )
        .withColumn(out_col, jl)
        .withColumn(
            f"{out_col}_f",
            F.transform(F.col(out_col), lambda c: c.cast("double") / 1e9),
        )
        .drop(vlong_col)
    )


def embedding_drift(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
    shift_round: int = 6,
) -> DataFrame:
    """Per-dimension embedding drift between two corpus snapshots —
    the embedding-space complement to the text-side ``corpus_drift``
    monitor: did the new crawl batch / re-embedding run shift the
    representation distribution? Returns one row per dimension:
    ``(pos, mean_a, mean_b, shift)`` with ``shift = mean_b − mean_a``
    floor-scaled at 10^-``shift_round``; downstream aggregates an L2
    or max over the (dimension-count-bounded) output as its alert
    metric.

    Means are DECIMAL(18,9)-exact sums over double-cast components
    before one double division (the proven label_centroids formula),
    so both engines compute identical doubles; dims present in only
    one snapshot (dimension change — itself a drift event) surface as
    NULL on the missing side. Cost: one posexplode + (pos)-keyed hash
    agg per side, then a join of two dim-sized relations."""

    def side(df: DataFrame, out: str) -> DataFrame:
        pos = df.select(F.posexplode(F.col(vec_col)).alias("__p", "__v"))
        return pos.groupBy("__p").agg(
            (
                F.sum(
                    F.col("__v").cast("double").cast("decimal(18,9)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias(out)
        )
    scale = float(10 ** shift_round)
    return (
        side(a, "mean_a")
        .join(side(b, "mean_b"), "__p", "full_outer")
        .select(
            (F.col("__p") + 1).cast("int").alias("pos"),
            "mean_a",
            "mean_b",
            (
                F.floor(
                    (F.col("mean_b") - F.col("mean_a")) * scale + 0.5
                )
                / scale
            ).alias("shift"),
        )
    )
