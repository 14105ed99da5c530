"""Mergeable sketches built ONLY from engine-exact primitives — an
HLL-style distinct-count register sketch (d25) and a count-min frequency
sketch (d27) — so (unlike the opaque built-in HLL++ behind
``approx_count_distinct``, b22 — permanently rows-only) every estimate
is bit-reproducible cross-engine and exact-hash oracle-able.

Design (the "XXH64-TZ" sketch): hash each value with the public-spec
``xxhash64``; low ``p`` bits pick one of ``m = 2^p`` registers, the
remaining bits ``w = h >>> p`` contribute a rank = 1 + trailing-zero
count of ``w`` (geometric, the same statistics as HLL's leading-zero
rank); a register keeps the MAX rank it sees. The estimate applies the
standard HyperLogLog bias correction ``alpha_m · m² / Σ 2^-R_j`` with
linear counting for the small range.

Exactness at scale, stage by stage:
- ranks are pure integer expressions (the trailing-zero bit trick
  ``bit_count((w & -w) - 1)`` — ``w ≥ 0`` after the unsigned shift, so
  no ANSI negation overflow);
- the register MAX and the harmonic sum are associative — the sum is
  integerized as ``Σ 2^(60-R_j)`` in ``decimal(38,0)`` (exact: ranks ≤
  55 at p ≥ 10, 2^69 worst-case total fits 38 digits), never a float
  reduction whose order could drift;
- the final formula is a handful of IEEE double ops on identical
  inputs, rounded before output.

Mergeability (the property that matters at 100 TB): registers combine by
MAX, so partial sketches from any partitioning — or from yesterday's
persisted sketch plus today's delta — merge losslessly; tested in
``test_hll_sketch_merge_equals_rebuild``.

Beyond-reference LLM-pipeline layer; no reference-file counterpart.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 60  # Σ 2^(SCALE - R) stays integral for every attainable rank


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def hll_registers(
    df: DataFrame,
    value_col: str,
    p: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``(group..., bucket, r)`` register relation — the persistable /
    mergeable sketch state (merge = MAX per bucket). One hash agg."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    h = F.xxhash64(F.col(value_col))
    bucket = h.bitwiseAND(F.lit(m - 1)).cast("int")
    w = F.shiftrightunsigned(h, p)
    rank = F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        F.bit_count((w.bitwiseAND(-w)) - 1) + 1
    )
    keys = [F.col(c) for c in (group_cols or [])]
    return (
        df.select(*keys, bucket.alias("bucket"), rank.cast("int").alias("__r"))
        .groupBy(*[c for c in (group_cols or [])], "bucket")
        .agg(F.max("__r").alias("r"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 10,
    group_cols: list[str] | None = None,
    est_round: int = 4,
) -> DataFrame:
    """Fold a register relation into ``(group..., est_distinct)``."""
    m = 1 << p
    gcols = list(group_cols or [])
    # shiftleft's bit-count arg must be a literal int in the Python API —
    # use the SQL form for the per-row exponent
    pow2 = F.expr(
        f"cast(shiftleft(cast(1 as bigint), {_SCALE} - r) as decimal(38,0))"
    )
    agg = registers.groupBy(*gcols).agg(
        F.sum(pow2).alias("__s_present"),
        F.count(F.lit(1)).alias("__present"),
    )
    # absent registers carry rank 0 → each contributes 2^SCALE exactly
    s_total = F.col("__s_present") + (
        (F.lit(m).cast("long") - F.col("__present")).cast("decimal(38,0)")
        * F.lit(1 << _SCALE).cast("decimal(38,0)")
    )
    zeros = (F.lit(m) - F.col("__present")).cast("double")
    raw = F.lit(_alpha(m) * m * m * float(1 << _SCALE)) / s_total.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *gcols, F.round(est, est_round).alias("est_distinct")
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    p: int = 10,
    group_cols: list[str] | None = None,
    est_round: int = 4,
) -> DataFrame:
    """One-shot sketch + fold: ``(group..., est_distinct)``."""
    return hll_estimate(
        hll_registers(df, value_col, p, group_cols), p, group_cols, est_round
    )


# ------------------------------------------------- count-min sketch (d27)


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = 1 << 14,
    depth: int = 4,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch as a ``(group..., row, col, cnt)`` relation —
    at most ``depth × width`` cells, mergeable by SUM (union + groupBy),
    persistable. Entirely integer: positions are ``pmod(xxhash64(value,
    i), width)`` and cells are exact counts, so estimates are
    bit-identical cross-engine with NO rounding contract at all —
    the strongest exactness class a sketch can have."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1, width >= 2")
    pos = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(width))
                .cast("int")
                .alias("col"),
            )
            for i in range(depth)
        ]
    )
    gcols = list(group_cols or [])
    ex = df.select(*gcols, F.explode(pos).alias("__rc"))
    return (
        ex.select(*gcols, F.col("__rc.row").alias("row"), F.col("__rc.col").alias("col"))
        .groupBy(*gcols, "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    cms: DataFrame,
    value_col: str,
    width: int = 1 << 14,
    depth: int = 4,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point-frequency estimates for each probe value: ``est_count = min``
    over the sketch's depth cells (0 if any cell is absent). Never
    underestimates; overestimates by collision mass ≤ ~N/width per row.
    The probe side explodes to ``depth`` rows and joins the cell relation
    on (group..., row, col) — with a broadcast-sized sketch this is depth
    map-side lookups, no shuffle of the probe frame's source.

    For a sketch built with ``cms_build(group_cols=...)`` pass the same
    ``group_cols`` here (the probe frame must carry them); otherwise
    cells from different groups would be conflated and the min taken
    across groups would silently underestimate — a sketch relation with
    unexpected extra columns is rejected."""
    gcols = list(group_cols or [])
    extra = sorted(set(cms.columns) - {*gcols, "row", "col", "cnt"})
    if extra:
        raise ValueError(
            f"cms_estimate: sketch carries grouping columns {extra}; "
            "pass the cms_build group_cols"
        )
    pos = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(width))
                .cast("int")
                .alias("col"),
            )
            for i in range(depth)
        ]
    )
    ex = probes.select(
        *gcols, F.col(value_col), F.explode(pos).alias("__rc")
    ).select(
        *gcols,
        value_col,
        F.col("__rc.row").alias("row"),
        F.col("__rc.col").alias("col"),
    )
    joined = ex.join(F.broadcast(cms), [*gcols, "row", "col"], "left")
    return joined.groupBy(*gcols, value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "est_count"
        )
    )


# ------------------------------- fixed-histogram quantile sketch (d32)
# Completes the engine-exact sketch family (membership: bloom_build,
# distinct: hll_*, frequency: cms_*) with QUANTILES. GK/t-digest are
# order- or RNG-dependent (not exact-hash oracle-able); the fixed
# equal-width histogram is the deterministic alternative: bin counts are
# integer SUMs (mergeable, partition-order-free), bin edges come from an
# exact min/max fit, and the estimate is a short IEEE-double formula on
# identical integer inputs — so DuckDB running the SAME SQL arithmetic
# reproduces every estimate bit-for-bit. Error bound: an interpolated
# estimate is within one bin width of the true quantile value.


def hist_fit(df: DataFrame, value_col: str, nbins: int = 1024) -> DataFrame:
    """One-row ``(lo double, hi double, width double)`` fit — exact
    min/max (order-independent), ``width = (hi - lo) / nbins`` in double.
    A persistable artifact: re-fit only when the value range drifts."""
    xd = F.col(value_col).cast("double")
    return df.agg(
        F.min(xd).alias("lo"),
        F.max(xd).alias("hi"),
        ((F.max(xd) - F.min(xd)) / F.lit(float(nbins))).alias("width"),
    )


def hist_build(
    df: DataFrame,
    value_col: str,
    nbins: int = 1024,
    fit: DataFrame | None = None,
) -> DataFrame:
    """``(bin int, cnt long)`` — at most ``nbins`` rows, mergeable by
    SUM (halves built separately and summed equal the full build —
    tested). ``bin = clamp(floor((x - lo) / width), 0, nbins-1)`` in
    IEEE double; a zero-width (constant) column lands everything in bin
    0. Nulls are dropped. One hash agg; state bounded by ``nbins``
    regardless of data size."""
    if fit is None:
        fit = hist_fit(df, value_col, nbins)
    xd = F.col(value_col).cast("double")
    bin_ = F.when(F.col("width") == 0.0, F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor((xd - F.col("lo")) / F.col("width")), F.lit(0).cast("long")
            ),
            F.lit(nbins - 1).cast("long"),
        )
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(fit))  # one-row fit: broadcast by construction
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    fit: DataFrame,
    qs: list[float],
    est_round: int | None = 6,
) -> DataFrame:
    """``(q double, est double)`` quantile estimates from a histogram
    sketch: ``target = ceil(q · N)``; the answer bin is the first whose
    running count reaches the target; the estimate interpolates inside
    it: ``lo + width · (bin + (target - cum_before) / cnt)``. The
    running sum runs over the BOUNDED bin relation (≤ nbins rows — a
    driver-free but bounded window, like the shard-plan prefix), and
    every arithmetic step is the same IEEE expression the oracle SQL
    spells out, so estimates hash-match cross-engine."""
    from pyspark.sql.window import Window as W

    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select("bin", "cnt", F.sum("cnt").over(w).alias("cum"))
    total = hist.agg(F.sum("cnt").alias("n"))
    from basis_devkit_spark.session import local_relation

    qdf = local_relation(
        hist.sparkSession, [(float(q),) for q in qs], "q double"
    )
    target = F.ceil(F.col("q") * F.col("n").cast("double")).alias("target")
    hits = (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(qdf))
        .withColumn("target", target)
        .filter(F.col("cum") >= F.col("target"))
    )
    first = hits.groupBy("q", "target").agg(
        F.min(F.struct("bin", "cnt", "cum")).alias("s")
    )
    est = F.col("lo") + F.col("width") * (
        F.col("s.bin").cast("double")
        + (
            (F.col("target") - (F.col("s.cum") - F.col("s.cnt"))).cast("double")
            / F.col("s.cnt").cast("double")
        )
    )
    if est_round is not None:
        est = F.round(est, est_round)
    return first.crossJoin(F.broadcast(fit)).select("q", est.alias("est"))


def hist_quantiles_grouped(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_col: str | None = None,
    nbins: int = 1024,
    est_round: int | None = 6,
) -> DataFrame:
    """Per-group histogram-sketch quantiles in one composed plan:
    ``(group_col?, q, est)`` — the grouped form of
    :func:`hist_fit` → :func:`hist_build` → :func:`hist_quantiles`,
    fused so operators (d50 winsorize / d58 robust_outliers
    ``method='sketch'``) can dial in the 100 TB single-pass
    approximation without leaving the plan. Two hash aggregates over
    the data (per-group min/max fit, then per-group bin counts — each
    with CONSTANT per-group state, ``nbins`` counters, unlike exact
    ``percentile()`` whose buffer grows with distinct values), then
    bounded work: the running sum windows over the
    (groups × nbins)-bounded bin relation and everything joins back as
    broadcasts. NULL values are dropped (same as exact percentile);
    NULL group keys are real groups (null-safe joins, repo standard).
    Error bound: each estimate is within one bin width
    ``(max-min)/nbins`` of the exact inverted-CDF quantile (the order
    statistic at rank ``ceil(q*N)``); the exact INTERPOLATED percentile
    can sit farther away across a value gap between adjacent order
    statistics."""
    from pyspark.sql.window import Window as W

    xd = F.col(value_col).cast("double")
    scored = df.filter(F.col(value_col).isNotNull())
    g = group_col
    if g is None:
        g = "__hg"
        scored = scored.withColumn(g, F.lit(0))
    fit = scored.groupBy(g).agg(
        F.min(xd).alias("lo"),
        F.max(xd).alias("hi"),
        ((F.max(xd) - F.min(xd)) / F.lit(float(nbins))).alias("width"),
    )
    fitj = fit.select(F.col(g).alias("__fg"), "lo", "hi", "width")
    binned = scored.join(
        F.broadcast(fitj), F.col(g).eqNullSafe(F.col("__fg"))
    )
    bin_ = (
        F.when(F.col("width") == 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor((xd - F.col("lo")) / F.col("width")),
                    F.lit(0).cast("long"),
                ),
                F.lit(nbins - 1).cast("long"),
            )
        )
        .cast("int")
    )
    hist = binned.groupBy(F.col(g), bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        W.partitionBy(g)
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.select(g, "bin", "cnt", F.sum("cnt").over(w).alias("cum"))
    total = hist.groupBy(g).agg(F.sum("cnt").alias("n")).select(
        F.col(g).alias("__tg"), "n"
    )
    from basis_devkit_spark.session import local_relation

    qdf = local_relation(
        df.sparkSession, [(float(q),) for q in qs], "q double"
    )
    hits = (
        cum.join(F.broadcast(total), F.col(g).eqNullSafe(F.col("__tg")))
        .crossJoin(F.broadcast(qdf))
        .withColumn(
            "target", F.ceil(F.col("q") * F.col("n").cast("double"))
        )
        .filter(F.col("cum") >= F.col("target"))
    )
    first = hits.groupBy(g, "q", "target").agg(
        F.min(F.struct("bin", "cnt", "cum")).alias("s")
    )
    est = F.col("lo") + F.col("width") * (
        F.col("s.bin").cast("double")
        + (
            (F.col("target") - (F.col("s.cum") - F.col("s.cnt"))).cast(
                "double"
            )
            / F.col("s.cnt").cast("double")
        )
    )
    if est_round is not None:
        est = F.round(est, est_round)
    out = first.join(
        F.broadcast(fitj), F.col(g).eqNullSafe(F.col("__fg"))
    ).select(g, "q", est.alias("est"))
    if group_col is None:
        out = out.drop("__hg")
    return out
