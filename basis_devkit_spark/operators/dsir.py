"""DSIR-style hashed n-gram importance weighting for data selection.

Public method: Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" (DSIR) — select raw-corpus documents whose hashed
n-gram distribution looks like a small high-quality TARGET set, by scoring
each document with the log-likelihood ratio of two hashed bag-of-ngrams
models. The standard recipe behind "make CommonCrawl look like Wikipedia".

Spark-first re-expression, following this repo's exactness rules:

- **Feature extraction is a pure column expression.** Words are
  whitespace-lowered; unigrams..n-grams are built with ``transform`` over
  an index sequence (no UDF); every gram OCCURRENCE (with multiplicity —
  DSIR uses frequencies, not presence) hashes to one of ``num_buckets``
  buckets via ``pmod(xxhash64(gram), B)``.
- **Bucket counts are one hash agg each** for the raw corpus and the
  target set — map-side combinable, output bounded by ``num_buckets``.
- **Floats live on the driver only.** The Laplace-smoothed log-ratio
  weight per bucket, ``w(b) = floor(scale * (ln((ct(b)+1)/(Tt+B)) -
  ln((cr(b)+1)/(Tr+B))))``, is computed in ONE Python runtime from the
  two collected bounded count relations (the same driver-side-fit
  contract as the d24 hashed logreg and the d03c/d03d quantizers), then
  shipped back as an integer weight relation. The distributed scoring
  path — explode grams, broadcast-join the ≤B-row weight table, integer
  SUM per document — contains no float op anywhere, so scores are exact
  and bit-identical under any partitioning/engine.
- **100 TB shape**: two corpus scans (raw counts once — an artifact to
  persist; target is small by definition), then scoring = scan + explode
  + broadcast join + one integer agg. No shuffle carries gram strings
  beyond the bounded bucket-count aggs; the weight table is a build-once
  persistable artifact (re-fit only when the target or corpus drifts).

Reference parity: the reference devkit has no data-selection operator;
this extends the mandated LLM-pipeline layer (BASELINE.json), same
family as quality filtering (d24) and mixture weights (d22).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from basis_devkit_spark.session import local_relation

#: Default feature-space size. DSIR's paper uses 10k buckets; 4096 keeps
#: the weight relation broadcast-trivial while collisions stay rare at
#: test vocab sizes.
DEFAULT_BUCKETS = 4096


def _words(text_col: str | Column) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"),
        lambda w: w != "",
    )


def _gram_buckets_from(
    toks: Column, num_buckets: int = DEFAULT_BUCKETS, ngram_n: int = 2
) -> Column:
    """Hashed gram buckets from an already-bound token ARRAY column.
    ``toks`` should be a materialized attribute (its own projection), not
    an inline expression: higher-order functions run interpreted, so an
    inlined split() child is re-evaluated for every lambda element —
    O(tokens²) regex work per document (the d04j lesson)."""

    # NB: a two-arg lambda would be called by transform as (element,
    # index) — bind n via a real closure, never a defaulted second param.
    def _grams(n: int) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        return F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
        ).otherwise(F.array().cast("array<string>"))

    parts = [_grams(n) for n in range(1, ngram_n + 1)]
    allg = F.concat(*parts) if len(parts) > 1 else parts[0]
    return F.transform(
        allg, lambda g: F.pmod(F.xxhash64(g), F.lit(num_buckets))
    )


def gram_buckets(
    text_col: str | Column, num_buckets: int = DEFAULT_BUCKETS, ngram_n: int = 2
) -> Column:
    """``array<long>`` of hashed gram buckets — every unigram..``ngram_n``
    occurrence (with multiplicity) of the whitespace-lowered text, each
    hashed to ``pmod(xxhash64(gram), num_buckets)``. Pure expression.
    Prefer materializing the token array in its own projection and
    calling the counting/scoring entry points — an inline text column
    re-splits per lambda element under interpreted HOFs."""
    return _gram_buckets_from(_words(text_col), num_buckets, ngram_n)


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_n: int = 2,
) -> DataFrame:
    """``(bucket long, cnt long)`` — hashed-gram occurrence counts, one
    hash agg, ≤ ``num_buckets`` rows. Mergeable by SUM (so per-shard
    counts can be combined), persistable as the corpus-side artifact."""
    ex = df.select(_words(text_col).alias("__toks")).select(
        F.explode(
            _gram_buckets_from(F.col("__toks"), num_buckets, ngram_n)
        ).alias("bucket")
    )
    return ex.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def dsir_weights(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    num_buckets: int = DEFAULT_BUCKETS,
    scale: int = 10**6,
) -> tuple[list[tuple[int, int]], int]:
    """Integerized log-ratio weights from two BOUNDED count relations
    (≤ ``num_buckets`` rows each — a driver-side fit, the d24 contract):
    ``w(b) = floor(scale * (ln((ct+1)/(Tt+B)) - ln((cr+1)/(Tr+B))))``.
    Returns ``(rows, default_w)`` where ``default_w`` is the weight of a
    bucket unseen in BOTH relations (applies to new docs at score time).
    All ``ln`` calls run in one CPython/libm — no cross-engine float."""
    cr = {int(r["bucket"]): int(r["cnt"]) for r in raw_counts.collect()}
    ct = {int(r["bucket"]): int(r["cnt"]) for r in target_counts.collect()}
    tr, tt = sum(cr.values()), sum(ct.values())
    b = num_buckets
    rows = [
        (
            bk,
            math.floor(
                scale
                * (
                    math.log((ct.get(bk, 0) + 1) / (tt + b))
                    - math.log((cr.get(bk, 0) + 1) / (tr + b))
                )
            ),
        )
        for bk in sorted(set(cr) | set(ct))
    ]
    default_w = math.floor(
        scale * (math.log(1 / (tt + b)) - math.log(1 / (tr + b)))
    )
    return rows, default_w


def dsir_score(
    df: DataFrame,
    weight_rows: list[tuple[int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_n: int = 2,
    default_w: int = 0,
) -> DataFrame:
    """``(id, dsir_score long, n_grams long)`` — per-document integer
    importance score: SUM of bucket weights over every gram occurrence
    (unseen buckets get ``default_w``). The weight table rides a
    broadcast hash join; docs with no grams score 0. Exact integer
    arithmetic end to end."""
    spark = df.sparkSession
    # public API for persisted weight artifacts: duplicate buckets would
    # silently fan out the join and inflate both score and n_grams
    seen: set[int] = set()
    for bk, _ in weight_rows:
        if bk in seen:
            raise ValueError(f"dsir_score: duplicate bucket {bk} in weight_rows")
        seen.add(bk)
    wdf = local_relation(spark, weight_rows, "bucket long, w long")
    ex = df.select(
        F.col(id_col).alias("__id"), _words(text_col).alias("__toks")
    ).select(
        "__id",
        F.explode_outer(
            _gram_buckets_from(F.col("__toks"), num_buckets, ngram_n)
        ).alias("bucket"),
    )
    j = ex.join(F.broadcast(wdf), "bucket", "left")
    scored = j.groupBy("__id").agg(
        F.sum(
            F.when(F.col("bucket").isNull(), F.lit(0)).otherwise(
                F.coalesce(F.col("w"), F.lit(default_w))
            )
        ).alias("dsir_score"),
        F.count("bucket").alias("n_grams"),
    )
    return scored.select(
        F.col("__id").alias(id_col), "dsir_score", "n_grams"
    )


def dsir_pipeline(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_n: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """Fit on (raw, target), score ``raw``: the one-call form. For a
    persisted deployment, materialize ``dsir_bucket_counts`` per corpus
    shard and the weight relation once, then call :func:`dsir_score`."""
    rc = dsir_bucket_counts(raw, text_col, num_buckets, ngram_n)
    tc = dsir_bucket_counts(target, text_col, num_buckets, ngram_n)
    rows, default_w = dsir_weights(rc, tc, num_buckets, scale)
    return dsir_score(
        raw, rows, text_col, id_col, num_buckets, ngram_n, default_w
    )
