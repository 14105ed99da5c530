"""Lexical & hybrid retrieval over document corpora.

- ``bm25_topk`` — Okapi BM25 scoring for a bounded literal term set:
  corpus statistics (N, avgdl, per-term df) come from ONE aggregation
  whose output is a single row (bounded by |terms|), broadcast back; the
  per-document score is a pure column expression in FIXED term order, so
  the only shuffle in the whole plan is the stats aggregation and the
  final top-k is TakeOrdered (no global sort materialization). The shape
  a 100 TB corpus needs: one scan + one tiny agg + one map-side scoring
  pass.
- ``rrf_fuse`` — reciprocal-rank fusion of K rankings (the standard
  hybrid lexical+vector combiner): contributions ``1/(kr + rank)`` are
  exact IEEE divisions summed in fixed ranking order, so fused scores are
  deterministic cross-engine; items absent from a ranking contribute 0.

Beyond-reference LLM-pipeline layer (retrieval primitives for RAG-style
corpus serving); no reference-file counterpart.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int | None = 4,
) -> DataFrame:
    """Okapi BM25 top-k: ``(doc_id, score, rank)`` for a literal query
    term set (tokenization: lowercase, single-space split — the corpus
    oracle convention). IDF is the standard
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``.

    Determinism: tf/dl/df/N are exact integers; avgdl is one double
    division; the per-term contributions are summed in EXPLICIT term
    order (a fixed-order expression chain, not an agg over term rows, so
    no reduction-order drift); the score is rounded BEFORE ranking
    (doc_id tie-break) per the round-before-rank rule. Scale: stats are
    one single-row aggregation broadcast back via crossJoin (the
    documented single-row-totals pattern); scoring is a pure projection;
    top-k is TakeOrderedAndProject."""
    if not terms:
        raise ValueError("terms must be non-empty")
    # Documents are lowercased below, so match terms in the same space —
    # a verbatim mixed-case term (e.g. "Spark") would silently score 0.
    terms = [t.lower() for t in terms]
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("__dl"),
        *[_tf(toks, t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        idf = F.log(
            (F.col("__n") - F.col(f"__df{i}") + 0.5) / (F.col(f"__df{i}") + 0.5)
            + 1.0
        )
        denom = tf + k1 * (1.0 - b + b * (F.col("__dl") / F.col("__avgdl")))
        contribs.append(idf * (tf * (k1 + 1.0)) / denom)
    # fixed-order sum: c0 + c1 + ... (left-assoc), same order as the oracle
    score = reduce(lambda a, c: a + c, contribs)
    if score_round is not None:
        score = F.round(score, score_round)
    from pyspark.sql.window import Window

    # the window runs AFTER limit(k) — k rows, one partition; the
    # corpus-wide step stays TakeOrderedAndProject
    return (
        scored.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("score"), "doc_id"))
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    kr: int = 60,
    k: int = 10,
    score_round: int | None = 6,
) -> DataFrame:
    """Reciprocal-rank fusion: ``(doc_id, score, rank)`` where score =
    sum over rankings of ``1 / (kr + rank)`` for the items each ranking
    contains (absent = 0 contribution). Rankings join full-outer on id —
    each is already top-k-bounded upstream, so every side is tiny
    relative to the corpus; the fused sum is an explicit fixed-order
    expression (no agg reduction-order drift) and the final rank is on
    the ROUNDED score with id tie-break."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    sides = [
        r.select(
            F.col(id_col).alias("doc_id"),
            F.col(rank_col).cast("double").alias(f"__r{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, "doc_id", "full_outer"), sides)
    contribs = [
        F.coalesce(1.0 / (F.lit(float(kr)) + F.col(f"__r{i}")), F.lit(0.0))
        for i in range(len(rankings))
    ]
    score = reduce(lambda a, c: a + c, contribs)
    if score_round is not None:
        score = F.round(score, score_round)
    from pyspark.sql.window import Window

    return (
        joined.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("score"), "doc_id"))
        )
    )
