"""BPE vocabulary induction (byte-pair-encoding merge learning) on Spark.

The tokenizer-training step of a pretraining pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public algorithm), re-expressed for the Spark execution model:

- **Count once, iterate on the distinct-word relation.** The corpus is
  scanned exactly once: ``lower → whitespace-split → groupBy word``
  yields ``(word, weight)``; every merge round then works on this
  bounded-vocabulary frame (distinct words ≪ corpus tokens — at 100 TB
  the word relation is millions of rows while the corpus is trillions of
  tokens), so the per-round shuffle is vocabulary-sized, not
  corpus-sized.
- **One hash-agg shuffle per round.** A round explodes adjacent symbol
  pairs weighted by word count (map-side partial agg), takes the global
  top pair via a bounded single-row fetch (count desc, pair asc — fully
  deterministic), and applies the merge as a pure projection (the
  left-to-right greedy fold standard BPE uses). No windows, no joins.
- **Exact integer arithmetic end to end.** Pair counts are integer sums
  of integer word weights — associative, bit-identical under any
  partitioning, and exactly reproducible by a Python model over the same
  corpus (how the d30 oracle verifies the learned merge table).

Reference parity: the reference devkit delegates tokenizer training to
its pipeline layer (basis-devkit patterns/pipelines); this provides the
equivalent as a first-class relational operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word marker appended to every word's symbol sequence, so merges
#: can distinguish word-final subwords ("est</w>" vs "est") — the
#: standard Sennrich formulation.
EOW = "</w>"


def _word_weights(corpus: DataFrame, text_col: str) -> DataFrame:
    """``(word string, weight long)`` — distinct whitespace-lowered words
    with corpus frequencies. The ONLY corpus-wide scan BPE performs."""
    toks = F.explode(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    ).alias("word")
    return (
        corpus.select(toks)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge (left, right) →
    left||right over a symbol array — the standard BPE apply: a merged
    symbol never re-merges with the following symbol in the same round
    (so pair (a,a) over "aaa" yields [aa, a], not [aa, aa])."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(
    corpus: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    words: DataFrame | None = None,
    batch_merges: int = 1,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    ``(merge_rank int, left string, right string, merged string,
    pair_count long)`` — ``num_merges`` rows, the persistable tokenizer
    artifact (feed its (left, right) rows to :func:`bpe_apply` /
    ``sequence_pack``'s token-count column).

    Round r: explode adjacent symbol pairs of every distinct word
    (weighted by word frequency), integer-sum per pair, fetch the top
    ``batch_merges`` rows (count desc, then (left, right) asc — a
    bounded ``limit(N)`` fetch, the same bounded-driver-fetch contract
    as pagerank's per-round convergence scalar), then rewrite the symbol
    arrays with the greedy fold(s). The evolving word-symbols frame is
    re-persisted each round and the previous round's cache released — at
    any moment exactly one vocabulary-sized frame is pinned.

    **Scale bound — rounds are inherently sequential.** Each round is
    one Spark job whose input is the previous round's output; with
    ``batch_merges=1`` (classic BPE, the d30 oracle semantics) a
    production 32k-merge vocabulary means 32k sequential vocabulary-
    sized jobs — correct, but latency-bound by round count, not data.
    ``batch_merges=N`` is the scale path: per round, greedily admit from
    the top-N pairs every pair whose symbols {left, right, left+right}
    are disjoint from all pairs already admitted this round. Disjoint
    merges cannot create, destroy, or consume one another's adjacencies
    (a merge replaces [l, r] with one new symbol; its neighbors become
    adjacent to the NEW symbol, never to each other), so each admitted
    pair's count is exactly its pre-batch count and the per-round fetch
    stays bounded. Round count drops ~N-fold. The learned table can
    diverge from classic BPE only where classic's successive top pairs
    would have overlapped — a documented, deterministic semantics
    (mirrored exactly by the ``pyoracle.bpe_merges_model`` oracle, which
    takes the same ``batch_merges``).

    Pass a precomputed ``words`` (``(word, weight)``) to skip the corpus
    scan — the build-once path when several tokenizers are fit on one
    corpus."""
    if batch_merges < 1:
        raise ValueError("batch_merges must be >= 1")
    if words is None:
        words = _word_weights(corpus, text_col)
    syms = words.select(
        "weight",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    ).persist()
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        while len(merges) < num_merges:
            pairs = (
                syms.select(
                    "weight",
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("syms"), 1, F.size("syms") - 1),
                            F.slice(F.col("syms"), 2, F.size("syms") - 1),
                            lambda a, b: F.struct(
                                a.alias("l"), b.alias("r")
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("weight").alias("cnt"))
            )
            top = pairs.orderBy(
                F.col("cnt").desc(), F.col("l"), F.col("r")
            ).limit(batch_merges).collect()  # bounded: <= N rows per round
            if not top:
                break
            # Greedy disjoint admission: the first candidate is always
            # admitted, so every round makes progress.
            used: set[str] = set()
            batch: list[tuple[str, str, int]] = []
            for row in top:
                if len(merges) + len(batch) >= num_merges:
                    break
                left, right = row["l"], row["r"]
                if {left, right, left + right} & used:
                    continue
                used |= {left, right, left + right}
                batch.append((left, right, int(row["cnt"])))
            col = F.col("syms")
            for left, right, cnt in batch:
                merges.append(
                    (len(merges), left, right, left + right, cnt)
                )
                col = _merge_fold(col, left, right)
            nxt = syms.select("weight", col.alias("syms")).persist()
            nxt.count()  # materialize before releasing the parent cache
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    spark = corpus.sparkSession
    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, pair_count long",
    )


def bpe_apply(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: lower →
    whitespace words → per word, chars + ``</w>`` folded through every
    merge in rank order → ``out_col`` = flat ``array<string>`` of subword
    tokens. The merge table is bounded (``num_merges`` rows) and is read
    onto the driver once to build the projection — tokenization itself is
    a pure per-row expression (no shuffle, no UDF), so it composes with
    ``token_count``-style downstream packing at any scale."""
    ranked = [
        (r["left"], r["right"])
        for r in merges.orderBy("merge_rank").collect()  # bounded artifact
    ]
    word_syms = lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW)))

    def tokenize_word(w: Column) -> Column:
        syms = word_syms(w)
        for left, right in ranked:
            syms = _merge_fold(syms, left, right)
        return syms

    wordarr = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: w != "",
    )
    return df.withColumn(
        out_col, F.flatten(F.transform(wordarr, tokenize_word))
    )
