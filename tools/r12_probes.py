#!/usr/bin/env python
"""Round-12 scale probes.

``merge_bound``: boundedness of the r12 grouped top-k merge tree
(VERDICT r11 finding #1). The old flat merge collected EVERY
(group, partition) top-k array into one aggregation buffer per group —
fan-in P for a group spanning P map partitions, i.e. a P×k-struct
buffer (multi-GB for a hot stratum at 10⁵–10⁶ partitions with
curation-sized k). The bounded tree folds by ``pid div merge_fanin``
per level. This probe forces 10,000 input partitions with a hot group
covering all of them and MEASURES the max merge fan-in (arrays entering
one buffer) per level for both shapes, asserts the outputs are
identical, and records walls.

``d44_longdocs``: the repetition_signals docstring claims the explode
path scales to book-length documents where a within-array O(n²) count
would not. Synthetic documents of 10³/10⁴/10⁵ words (5k-word
vocabulary, so distinct bigrams ≈ doc length) drive BOTH shapes:
the shipped explode → (doc, gram) hash agg → argmax, and the HOF
strawman ``transform(array_distinct(grams), g -> size(filter(grams,
= g)))``. Records wall and the (doc, gram) exchange row count (the
shuffle-size proxy: rows × ~gram bytes) per doc length; the strawman
is skipped at 10⁵ words once its quadratic growth is demonstrated.

Run: ``python tools/r12_probes.py merge_bound|d44_longdocs``
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark():
    from basis_devkit_spark import get_spark

    s = get_spark()
    s.sparkContext.setLogLevel("ERROR")
    return s


def merge_bound():
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.text import (
        weighted_reservoir_sample_grouped,
    )

    spark = _spark()
    P, K, FANIN, N = 10_000, 100, 1024, 2_000_000
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.lit("cold"))
            .alias("grp"),
            ((F.col("id") % 13) + 1).cast("double").alias("w"),
        )
        .repartition(P)
        .persist()
    )
    df.count()

    # measured fan-in: arrays entering ONE merge buffer, per level.
    # local level has one array per (grp, pid); flat merge folds them all
    # at once, the tree folds pid div FANIN then the ceil(P/FANIN) bucket
    # heads.
    cells = (
        df.withColumn("__pid", F.spark_partition_id().cast("long"))
        .select("grp", "__pid")
        .distinct()
        .persist()
    )
    flat_fanin = (
        cells.groupBy("grp").count().agg(F.max("count")).first()[0]
    )
    lvl1_fanin = (
        cells.withColumn("__b", F.expr(f"__pid div {FANIN}"))
        .groupBy("grp", "__b")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    final_fanin = (
        cells.select("grp", F.expr(f"__pid div {FANIN}").alias("__b"))
        .distinct()
        .groupBy("grp")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    cells.unpersist()

    def run(fanin):
        t = time.time()
        out = weighted_reservoir_sample_grouped(
            df, "w", K, group_col="grp", merge_fanin=fanin
        )
        rows = sorted(
            (r["grp"], r["doc_id"], r["rank"]) for r in out.collect()
        )
        return time.time() - t, rows

    w_tree, r_tree = run(FANIN)
    w_flat, r_flat = run(10**9)  # no intermediate level = pre-r12 shape
    assert r_tree == r_flat, "merge tree changed the sample!"
    print(
        json.dumps(
            {
                "partitions": P,
                "k": K,
                "merge_fanin": FANIN,
                "max_fanin_flat_merge": flat_fanin,
                "max_fanin_tree_level1": lvl1_fanin,
                "max_fanin_tree_final": final_fanin,
                "max_buffer_structs_flat": flat_fanin * K,
                "max_buffer_structs_tree": max(lvl1_fanin, final_fanin) * K,
                "wall_tree_s": round(w_tree, 2),
                "wall_flat_s": round(w_flat, 2),
                "outputs_identical": True,
            }
        )
    )
    df.unpersist()


def _long_docs(spark, n_docs: int, n_words: int, vocab: int = 5000):
    from pyspark.sql import functions as F

    # deterministic pseudo-random words from a fixed vocabulary: word i
    # of doc d = w((d*131 + i*7919) % vocab) — no RNG state, corpus-like
    # bigram diversity (distinct bigrams ~ doc length at vocab=5000)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.concat(
                    F.lit("w"),
                    ((F.col("id") * 131 + i * 7919) % vocab).cast("string"),
                ),
            ),
        ).alias("text"),
    )


def d44_longdocs():
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.text import repetition_signals

    spark = _spark()
    results = []
    for n_words, n_docs, run_hof in ((1_000, 64, True), (10_000, 32, True), (100_000, 16, False)):
        docs = _long_docs(spark, n_docs, n_words).persist()
        docs.count()

        t = time.time()
        out = repetition_signals(docs)
        agg = out.agg(
            F.sum("top_bigram_count"), F.sum("dup_line_fraction")
        ).first()
        w_explode = time.time() - t
        exchange_rows = n_docs * (n_words - 1)  # (doc, gram) rows shuffled

        w_hof = None
        if run_hof:
            c = F.coalesce(F.col("text"), F.lit(""))
            words = F.filter(
                F.split(F.lower(F.trim(c)), r"\s+"), lambda w: w != ""
            )
            grams = F.zip_with(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
            t = time.time()
            hof = docs.select(
                "doc_id",
                F.array_max(
                    F.transform(
                        F.array_distinct(grams),
                        lambda g: F.size(
                            F.filter(grams, lambda x: x == g)
                        ),
                    )
                ).alias("top_bigram_count"),
            )
            hof.agg(F.sum("top_bigram_count")).first()
            w_hof = time.time() - t
        results.append(
            {
                "n_words": n_words,
                "n_docs": n_docs,
                "explode_wall_s": round(w_explode, 2),
                "hof_wall_s": None if w_hof is None else round(w_hof, 2),
                "gram_exchange_rows": exchange_rows,
                "sum_top_bigram_count": int(agg[0]),
            }
        )
        docs.unpersist()
        print(json.dumps(results[-1]))
    print(json.dumps({"probe": "d44_longdocs", "rows": results}))


if __name__ == "__main__":
    {"merge_bound": merge_bound, "d44_longdocs": d44_longdocs}[sys.argv[1]]()
