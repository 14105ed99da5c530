"""Time-series operators: bucket roll-up with gap filling and LOCF
(the TimescaleDB ``time_bucket_gapfill``/``locf`` analogue — public
semantics), Spark-first.

Scale shape: the per-group aggregate is one hash agg; the dense bucket
spine is ``sequence()`` over the GLOBAL [min, max] bucket range
(broadcast scalars) exploded per group — its size is groups × buckets,
a *chosen* densification, never data-dependent skew; LOCF is one
bounded window pass per group. No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str = "user_id",
    bucket: str = "hour",
    fill: str = "locf",
) -> DataFrame:  # noqa: C901
    """Dense per-group time buckets over the corpus [min, max] range:
    aggregate ``value_col`` (decimal-exact sum) into ``bucket``-truncated
    slots, emit EVERY slot for every group, and fill empty slots —
    ``fill='locf'`` carries the last observed value forward (leading
    gaps stay NULL, as TimescaleDB's ``locf`` does), ``'interp'``
    linearly interpolates between the surrounding observations (edge
    gaps with only one neighbor stay NULL, as TimescaleDB's
    ``interpolate`` does), ``'null'`` leaves gaps NULL, ``'zero'``
    fills 0.

    Returns ``(group, bucket_ts, v, filled)`` where ``v`` is the slot's
    own aggregate (NULL when empty) and ``filled`` is the gap-filled
    series.
    """
    if fill not in ("locf", "null", "zero", "interp"):
        raise ValueError(f"unknown fill mode: {fill!r}")
    b = F.date_trunc(bucket, F.col(ts_col))
    agg = df.groupBy(F.col(group_col).alias("__g"), b.alias("__b")).agg(
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__v")
    )
    rng = agg.agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    groups = df.select(F.col(group_col).alias("__sg")).distinct()
    spine = groups.join(F.broadcast(rng)).select(
        "__sg",
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval 1 {bucket}"))
        ).alias("__sb"),
    )
    # null-safe group key: a NULL group is still a series (repo
    # standard) — a plain equi-join would leave its slots permanently
    # empty while its aggregates silently vanish
    j = spine.join(
        agg,
        F.col("__sg").eqNullSafe(F.col("__g"))
        & (F.col("__sb") == F.col("__b")),
        "left",
    )
    v = F.col("__v").cast("double")
    if fill == "locf":
        w = (
            Window.partitionBy("__sg")
            .orderBy("__sb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last("__v", ignorenulls=True).over(w).cast("double")
    elif fill == "interp":
        wf = (
            Window.partitionBy("__sg")
            .orderBy("__sb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # next-observation lookahead as a GROWING frame over descending
        # bucket order: first(x) over [current, unbounded following] asc
        # == last(x) over [unbounded preceding, current] desc, but
        # Spark's unbounded-following frame processor re-evaluates the
        # aggregate from the current row to the partition end for EVERY
        # row — O(rows²) per series (measured 19 s vs 1.3 s at sf0.1);
        # the growing frame is a linear running aggregate. Buckets are
        # unique per series (dense spine), so the order is total.
        wb = (
            Window.partitionBy("__sg")
            .orderBy(F.col("__sb").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # ts may be TIMESTAMP_NTZ; unix_micros wants TIMESTAMP (UTC session)
        obs_t = F.when(
            F.col("__v").isNotNull(), F.unix_micros(F.col("__sb").cast("timestamp"))
        )
        pv = F.last("__v", ignorenulls=True).over(wf).cast("double")
        pt = F.last(obs_t, ignorenulls=True).over(wf)
        nv = F.last("__v", ignorenulls=True).over(wb).cast("double")
        nt = F.last(obs_t, ignorenulls=True).over(wb)
        t = F.unix_micros(F.col("__sb").cast("timestamp"))
        frac = (t - pt).cast("double") / (nt - pt).cast("double")
        filled = F.when(F.col("__v").isNotNull(), v).otherwise(
            pv + (nv - pv) * frac  # NULL when either neighbor is missing
        )
    elif fill == "zero":
        filled = F.coalesce(v, F.lit(0.0))
    else:
        filled = v
    return j.select(
        F.col("__sg").alias(group_col),
        F.col("__sb").alias("bucket_ts"),
        v.alias("v"),
        filled.alias("filled"),
    )


def zscore_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "user_id",
    bucket: str = "hour",
    trailing: int = 24,
    min_periods: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly detection on per-group activity rates:
    bucket counts per group, then z-score each bucket against the mean /
    sample-stddev of its own STRICTLY PRECEDING ``trailing`` buckets
    (never the current one — the anomaly must not contaminate its own
    baseline). Buckets with fewer than ``min_periods`` baseline points
    or zero variance get a NULL z (explicitly — no engine-specific
    division-by-zero semantics). Returns flagged rows
    ``(group, bucket_ts, n_events, zscore)`` where ``|z| > threshold``.

    Shape: one hash agg + one bounded window per group — same cost class
    as any windowed rollup; scales with group-key partitioning.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    counts = df.groupBy(F.col(group_col).alias("__g"), b.alias("__b")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__b")
        .rowsBetween(-trailing, -1)
    )
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp("n_events").over(w)
    npts = F.count("n_events").over(w)
    z = F.when(
        (npts >= min_periods) & (sd > 0),
        F.floor((F.col("n_events") - mu) / sd * 1000000.0 + 0.5) / 1000000.0,
    )
    return (
        counts.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > threshold)
        .select(
            F.col("__g").alias(group_col),
            F.col("__b").alias("bucket_ts"),
            "n_events",
            "zscore",
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    group_col: str | None = None,
    out_col: str | None = None,
    bound_round: int = 4,
    method: str = "exact",
    nbins: int = 1024,
) -> DataFrame:
    """Quantile clipping (winsorization) — the standard outlier-
    taming step before averaging, scaling, or feeding a model: clamp
    ``value_col`` into its ``[p_lo, p_hi]`` exact (linear-
    interpolation) quantile range, globally or per ``group_col``. Adds
    ``out_col`` (default ``<value_col>_clipped``) plus the applied
    ``clip_lo``/``clip_hi`` bounds so downstream can tell clamped rows
    apart (``value != clipped``).

    The bounds are rounded to ``bound_round`` decimals BEFORE clamping:
    exact-percentile values agree across engines only to final-ulp
    wobble, and clamping against the rounded bound makes the clip
    decision a comparison of identical doubles on both sides (the b24
    percentile-parity contract).

    Scale shape: one hash-aggregate pass computes the (group-count-
    bounded) bounds relation, broadcast back onto the scan, then a pure
    projection. ``method='exact'`` (default) uses exact ``percentile()``
    — a full value-count buffer per group inside the agg, the
    reproducibility contract; ``method='sketch'`` swaps in the d32
    histogram-sketch quantiles (:func:`hist_quantiles_grouped` —
    CONSTANT ``nbins``-counter state per group, the 100 TB single-pass
    path) with each bound within one bin width ``(max-min)/nbins`` of
    the order statistic at rank ``ceil(p*N)``. NULL group keys are real groups (null-safe joins,
    repo standard)."""
    if not (0.0 <= p_lo < p_hi <= 1.0):
        raise ValueError("need 0 <= p_lo < p_hi <= 1")
    if method not in ("exact", "sketch"):
        raise ValueError("method must be 'exact' or 'sketch'")
    out_col = out_col or f"{value_col}_clipped"
    v = F.col(value_col).cast("double")
    r = lambda c: F.round(c, bound_round)
    if method == "sketch":
        from basis_devkit_spark.operators.sketches import (
            hist_quantiles_grouped,
        )

        qe = hist_quantiles_grouped(
            df, value_col, [float(p_lo), float(p_hi)], group_col,
            nbins=nbins, est_round=bound_round,
        )
        keys = [group_col] if group_col is not None else []
        b = qe.groupBy(*keys).agg(
            F.max(F.when(F.col("q") == float(p_lo), F.col("est"))).alias(
                "clip_lo"
            ),
            F.max(F.when(F.col("q") == float(p_hi), F.col("est"))).alias(
                "clip_hi"
            ),
        )
    elif group_col is None:
        b = df.agg(
            r(F.percentile(v, float(p_lo))).alias("clip_lo"),
            r(F.percentile(v, float(p_hi))).alias("clip_hi"),
        )
    else:
        b = df.groupBy(group_col).agg(
            r(F.percentile(v, float(p_lo))).alias("clip_lo"),
            r(F.percentile(v, float(p_hi))).alias("clip_hi"),
        )
    if group_col is None:
        joined = df.crossJoin(F.broadcast(b))  # one-row bounds relation
    else:
        # null-safe: a NULL group is still a group — a plain equi-join
        # would silently drop its rows (repo standard, cf. ADVICE r12)
        # LEFT: a group with no non-NULL values has no sketch bounds
        # row — its rows must survive with NULL bounds (exact parity)
        b2 = b.withColumnRenamed(group_col, "__gk")
        joined = df.join(
            F.broadcast(b2),
            F.col(group_col).eqNullSafe(F.col("__gk")),
            "left",
        ).drop("__gk")
    return joined.withColumn(
        out_col,
        F.least(F.greatest(v, F.col("clip_lo")), F.col("clip_hi")),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    k: float = 3.5,
    bound_round: int = 4,
    score_round: int = 6,
    method: str = "exact",
    nbins: int = 1024,
) -> DataFrame:
    """Median/MAD robust outlier scoring — the heavy-tail-safe sibling
    of :func:`winsorize` and the mean/stddev z-score: score each row by
    its modified z ``0.6745 * (x - median) / MAD`` (Iglewicz & Hoaglin),
    where ``MAD = median(|x - median|)``, globally or per ``group_col``.
    Unlike the mean/stddev z, a single extreme value cannot inflate its
    own baseline (both statistics have a 50% breakdown point), which is
    why corpus-curation filters (doc length, token counts, perplexity)
    use MAD bounds rather than stddev bounds. Adds ``med``, ``mad``,
    ``robust_z`` and boolean ``is_outlier`` (``|robust_z| > k``; the
    conventional cut is 3.5).

    Parity contract: ``med`` and ``mad`` are rounded to ``bound_round``
    decimals BEFORE the score is formed, and the score is floor-scaled
    to ``score_round`` decimals, so the outlier decision compares
    identical doubles across engines (the b24/d50 percentile-parity
    contract). Zero-MAD groups (>= half the group tied at the median)
    get NULL ``robust_z`` and ``is_outlier = false`` explicitly — no
    engine-specific division-by-zero semantics.

    Scale shape: two percentile hash aggregates (median, then the
    median of residuals — MAD is not algebraic, the second pass is
    irreducible) each producing a group-count-bounded relation that is
    broadcast back onto the scan (null-safe on the group key — a NULL
    group is still a group); everything else is projection.
    ``method='exact'`` (default) is the reproducibility contract —
    exact ``percentile()`` with a per-group value-count buffer;
    ``method='sketch'`` swaps BOTH medians for the d32 histogram-sketch
    quantiles (:func:`hist_quantiles_grouped`, constant ``nbins``
    state per group — the 100 TB single-pass path), each within one
    bin width of the rank-``ceil(N/2)`` order statistic."""
    v = F.col(value_col).cast("double")
    r = lambda c: F.round(c, bound_round)
    scale = float(10 ** score_round)
    if method not in ("exact", "sketch"):
        raise ValueError("method must be 'exact' or 'sketch'")

    def _back(big: DataFrame, small: DataFrame) -> DataFrame:
        if group_col is None:
            return big.crossJoin(F.broadcast(small))  # one-row relation
        # LEFT: all-NULL-value groups have no sketch statistic row but
        # must keep their rows (NULL med/mad, NULL z — exact parity)
        s2 = small.withColumnRenamed(group_col, "__gk")
        return big.join(
            F.broadcast(s2),
            F.col(group_col).eqNullSafe(F.col("__gk")),
            "left",
        ).drop("__gk")

    if method == "sketch":
        from basis_devkit_spark.operators.sketches import (
            hist_quantiles_grouped,
        )

        def _median(frame: DataFrame, col: str, alias: str) -> DataFrame:
            q = hist_quantiles_grouped(
                frame, col, [0.5], group_col, nbins=nbins,
                est_round=bound_round,
            )
            if group_col is None:
                # total aggregate: ONE row even when every value is
                # NULL (q empty), matching the exact path's agg()
                return q.agg(F.max("est").alias(alias))
            return q.select(group_col, F.col("est").alias(alias))

        med = _median(df, value_col, "med")
        with_med = _back(df, med)
        with_res = with_med.withColumn("__res", F.abs(v - F.col("med")))
        mad = _median(with_res, "__res", "mad")
        scored = _back(with_med, mad)
    else:
        keys = [group_col] if group_col is not None else []
        med = df.groupBy(*keys).agg(r(F.percentile(v, 0.5)).alias("med"))
        with_med = _back(df, med)
        mad = with_med.groupBy(*keys).agg(
            r(F.percentile(F.abs(v - F.col("med")), 0.5)).alias("mad")
        )
        scored = _back(with_med, mad)
    z = F.when(
        F.col("mad") > 0,
        F.floor(0.6745 * (v - F.col("med")) / F.col("mad") * scale + 0.5)
        / scale,
    )
    return scored.withColumn("robust_z", z).withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("robust_z")) > k, F.lit(False))
    )


def ewma_control(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str = "user_id",
    id_col: str = "event_id",
    alpha: float = 0.5,
    window: int = 16,
    threshold: float = 3.0,
    out_round: int = 6,
) -> DataFrame:
    """EWMA control chart (Roberts 1959 / NIST e-handbook 6.3.2.4) per
    group: score every observation against the exponentially weighted
    moving average of its own STRICTLY PRECEDING trailing ``window``
    values (never the current one — same no-self-contamination contract
    as :func:`zscore_anomalies`), weights ``(1-alpha)^age`` normalized
    over the values actually present (so early-series rows are scored
    against a correct short baseline, not a zero-padded one). Adds
    ``ewma_prev`` (the baseline), ``deviation`` (value - baseline, the
    control-chart residual) and boolean ``is_alert``
    (``|deviation| > threshold``); rows with no preceding history get
    NULL baseline and ``is_alert = false`` explicitly.

    The trailing-window form (vs the textbook full-history recursion)
    is the distributable one: the state a row needs is a bounded array,
    never an unbounded sequential scan, so the whole chart is one
    bounded window per group. Parity contract: the weighted fold is a
    SEQUENTIAL left fold on both engines (``F.aggregate`` here,
    ``list_reduce``-shaped sums in SQL), and the default
    ``alpha = 0.5`` makes every weight an exact power of two, so the
    baseline is bit-identical across engines before the 1e-6 floor-
    scaling even touches it. Ordering is (ts, id) — fully deterministic
    under timestamp ties.

    Scale shape: one window per group with a ``window``-bounded frame —
    the same cost class as any b31 frame aggregate; group-key hash
    partitioning, no shuffle beyond the window's, no Python."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("need 0 < alpha < 1")
    if window < 1:
        raise ValueError("need window >= 1")
    beta = 1.0 - alpha
    w = (
        Window.partitionBy(group_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-int(window), -1)
    )
    # most-recent-first, so element i carries weight beta^i. NULL
    # values are EXPLICITLY excluded from the baseline on both engines
    # (collect_list skips NULLs; the oracle spells the same contract as
    # a FILTER clause) — a missing observation contributes no weight,
    # it does not shift later weights onto a phantom position
    arr = F.reverse(
        F.collect_list(
            F.when(
                F.col(value_col).isNotNull(),
                F.col(value_col).cast("double"),
            )
        ).over(w)
    )
    scored = df.withColumn("__arr", arr)
    wt = lambda i: F.pow(F.lit(beta), i.cast("double"))
    num = F.aggregate(
        F.transform(F.col("__arr"), lambda x, i: x * wt(i)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(
        F.transform(F.col("__arr"), lambda x, i: wt(i)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scale = float(10 ** out_round)
    ewma = F.when(
        F.size("__arr") > 0, F.floor(num / den * scale + 0.5) / scale
    )
    dev = F.floor(
        (F.col(value_col).cast("double") - F.col("ewma_prev")) * scale + 0.5
    ) / scale
    return (
        scored.withColumn("ewma_prev", ewma)
        .withColumn("deviation", dev)
        .withColumn(
            "is_alert",
            F.coalesce(F.abs(F.col("deviation")) > threshold, F.lit(False)),
        )
        .drop("__arr")
    )


def cusum_changepoints(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    target: float = 0.0,
    slack: float = 0.0,
    threshold: float = 5.0,
    out_round: int = 6,
) -> DataFrame:
    """Two-sided CUSUM level-shift detection per series (Page 1954 —
    the classic SPC changepoint chart): the positive statistic
    ``S⁺_t = max(0, S⁺_{t-1} + (x_t − target − slack))`` accumulates
    evidence the series mean drifted UP past ``target`` (symmetric
    ``S⁻`` for down), and ``is_alarm`` fires when either side exceeds
    ``threshold``. The slack (allowance) absorbs in-control noise so
    small wander never alarms; the statistic resets itself to 0 the
    moment evidence reverses — a drift/regression tripwire for metric
    streams (ingest rate, quality-score level, conversion value) that
    a fixed z-score window (e09) smears across the change.

    The max-recursion is NOT run as a recursion: it has the exact
    closed form ``S_t = P_t − min(0, min_{j≤t} P_j)`` over the prefix
    sums ``P`` of the slack-adjusted deltas, so the whole chart is two
    running-window passes (sum, then min-of-sum) over ONE partitioning
    — per-series bounded window state, one shuffle, no iteration.
    Exact integer arithmetic end-to-end: values enter as
    ``floor(x·1e6 + 0.5)`` micro-units (an IEEE-identical op on both
    engines), prefix sums / minima / the threshold compare all stay
    integer, and the emitted doubles are exact integer-to-double
    conversions — bit-identical to the oracle by construction.

    Rows with NULL ``value`` contribute a zero delta (the chart
    ignores them rather than resetting), pass through with NULL
    ``cusum_pos``/``cusum_neg`` and never alarm. Ties in ``ts`` break
    on ``id_col`` (fully deterministic).

    Scale shape: series (``group_col``) partition the window — the
    same bounded per-key state as every e-layer chart; no global
    window, no collect.
    """
    scale = 10 ** out_round
    mu = int(round(float(target) * scale))
    kk = int(round(float(slack) * scale))
    hh = int(round(float(threshold) * scale))
    w = Window.partitionBy(group_col).orderBy(ts_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.floor(F.col(value_col).cast("double") * scale + 0.5).cast("long")
    dpos = F.coalesce(v - F.lit(mu) - F.lit(kk), F.lit(0))
    dneg = F.coalesce(F.lit(mu) - v - F.lit(kk), F.lit(0))
    staged = df.select(
        F.col(group_col),
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        v.alias("__v"),
        F.sum(dpos).over(run).alias("__ppos"),
        F.sum(dneg).over(run).alias("__pneg"),
    )
    spos = F.col("__ppos") - F.least(
        F.lit(0).cast("long"), F.min("__ppos").over(run)
    )
    sneg = F.col("__pneg") - F.least(
        F.lit(0).cast("long"), F.min("__pneg").over(run)
    )
    lit_scale = F.lit(float(scale))
    return staged.select(
        group_col,
        id_col,
        ts_col,
        value_col,
        F.when(F.col("__v").isNotNull(), spos / lit_scale).alias(
            "cusum_pos"
        ),
        F.when(F.col("__v").isNotNull(), sneg / lit_scale).alias(
            "cusum_neg"
        ),
        F.coalesce(
            F.col("__v").isNotNull()
            & ((spos > F.lit(hh)) | (sneg > F.lit(hh))),
            F.lit(False),
        )
        .cast("int")
        .alias("is_alarm"),
    )
