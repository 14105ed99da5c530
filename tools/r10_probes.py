#!/usr/bin/env python
"""Round-10 scale probes.

``bpe_apply``: proves the r9 VERDICT's one carried plan-shape item is
closed. The claim under test: ``bpe_apply`` builds one nested merge fold
per rank, so its wall (dominated by Catalyst analysis/codegen of the
expression tree) grows superlinearly with merge count — a compile-time
killer at a production 32k-merge vocabulary — while
``bpe_apply_indexed`` (broadcast vocab join + position-sorted regroup;
merges live in DATA, not expressions) stays FLAT as merges grow
16 → 64 → 256.

The shipped test corpus has only 31 distinct words (synthetic text), far
too few pairs to learn 256 merges, so the probe synthesizes a
deterministic corpus: 2,000 pseudo-words (seeded RNG) Zipf-ishly
repeated across 20,000 docs of ~60 words. Merges are learned ONCE at
the top count (batched — the d33 path); each lower count slices the
merge table and rebuilds its vocab with the chunked
``bpe_tokenize_words`` (vocabulary-sized, cheap).

``jl_compose``: d38's coarse-byte claim. Records bytes-per-row of the
coarse ANN scan for d20 (IVF x int8 over 64-d) vs d38 (IVF x int8 over
the 16-d JL projection) at equal nlist/nprobe — the 4x dimension cut
composing with the 4x int8 narrowing.

Run: ``python tools/r10_probes.py bpe_apply`` / ``jl_compose``
"""
from __future__ import annotations

import json
import os
import random
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark():
    from basis_devkit_spark import get_spark

    return get_spark()


def _synth_corpus(spark, n_vocab: int = 2000, n_docs: int = 20000,
                  words_per_doc: int = 60, seed: int = 7):
    rng = random.Random(seed)
    vocab = []
    seen = set()
    while len(vocab) < n_vocab:
        w = "".join(
            rng.choice(string.ascii_lowercase)
            for _ in range(rng.randint(5, 12))
        )
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    # Zipf-ish: word i drawn with weight ~ 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_vocab)]
    docs = [
        (i, " ".join(rng.choices(vocab, weights=weights, k=words_per_doc)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(docs, "doc_id long, text string").repartition(32)


def probe_bpe_apply() -> dict:
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.bpe import (
        bpe_apply,
        bpe_apply_indexed,
        bpe_learn_merges,
        bpe_tokenize_words,
    )

    spark = _spark()
    corpus = _synth_corpus(spark).persist()
    corpus.count()
    t0 = time.monotonic()
    merges_full = bpe_learn_merges(
        corpus, num_merges=256, batch_merges=32
    ).persist()
    n_learned = merges_full.count()
    learn_s = time.monotonic() - t0
    words = (
        corpus.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .persist()
    )
    words.count()
    out = {"learned_merges": n_learned, "learn_s": round(learn_s, 1),
           "n_docs": corpus.count(), "points": []}
    for n in (16, 64, 256):
        if n > n_learned:
            break
        mt = merges_full.filter(F.col("merge_rank") < n)
        t0 = time.monotonic()
        vocab = bpe_tokenize_words(words, mt, chunk=16).persist()
        vocab.count()
        vocab_s = time.monotonic() - t0
        t0 = time.monotonic()
        idx_n = (
            bpe_apply_indexed(corpus, vocab, mt)
            .agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]
        )
        idx_s = time.monotonic() - t0
        # The fold form is EXPECTED to stop compiling as merges grow:
        # at 64 merges Catalyst's Resolution batch exceeds its 100-
        # iteration cap on the per-word nested-fold expression ("Max
        # iterations (100) reached for batch Resolution") — the plan
        # never reaches execution. That failure IS the probe result.
        t0 = time.monotonic()
        try:
            fold_n = (
                bpe_apply(corpus, mt)
                .agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]
            )
            fold_s: float | str = round(time.monotonic() - t0, 2)
            assert idx_n == fold_n, (n, idx_n, fold_n)
        except Exception as e:  # analysis/codegen blow-up, by design
            fold_s = f"FAILS: {str(e).splitlines()[0][:90]}"
        vocab.unpersist()
        out["points"].append({
            "merges": n,
            "vocab_build_s": round(vocab_s, 2),
            "indexed_apply_s": round(idx_s, 2),
            "fold_apply_s": fold_s,
            "tokens": int(idx_n),
        })
    return out


def probe_jl_compose() -> dict:
    """Coarse-scan bytes per corpus row: d20 (int8 codes over 64 dims)
    vs d38 (int8 codes over the 16-d JL projection) — plus measured
    recall of each vs the exact d03 top-k at equal nlist/nprobe."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.similarity import (
        brute_force_topk,
        ivf_quantized_topk,
        jl_ivf_quantized_topk,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = _spark()
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").persist()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 30)
    exact = {
        (r["query_id"], r["match_id"])
        for r in brute_force_topk(q, emb, k=5).collect()
    }

    def recall(df):
        got = {(r["query_id"], r["match_id"]) for r in df.collect()}
        return round(len(got & exact) / len(exact), 3)

    t0 = time.monotonic()
    r20 = recall(ivf_quantized_topk(q, emb, k=5, nlist=8, nprobe=4, refine=4))
    t20 = time.monotonic() - t0
    t0 = time.monotonic()
    r38 = recall(
        jl_ivf_quantized_topk(q, emb, k=5, nlist=8, nprobe=4, refine=4)
    )
    t38 = time.monotonic() - t0
    dim = len(emb.select("embedding").first()[0])
    return {
        "corpus_rows": n,
        "coarse_bytes_per_row_d20": dim,        # int8 per original dim
        "coarse_bytes_per_row_d38": 16,         # int8 per JL dim
        "byte_cut": round(dim / 16, 1),
        "recall_d20": r20,
        "recall_d38": r38,
        "wall_d20_s": round(t20, 2),
        "wall_d38_s": round(t38, 2),
    }


def probe_bpe_counts() -> dict:
    """d40's shuffle-payload claim with data: per-doc counts via the
    counts-only path (broadcast (word, n_sub) longs + partial SUM) vs
    size() over the full d37 array regroup, on the synthetic corpus at
    1x and 4x docs — the counts path's advantage should GROW with data
    (its shuffle carries one long per doc-partition; d37's carries every
    word's token array)."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.bpe import (
        bpe_apply_indexed,
        bpe_learn_merges,
        bpe_token_counts_indexed,
    )

    spark = _spark()
    out = {"points": []}
    for mult in (1, 4):
        corpus = _synth_corpus(spark, n_docs=20000 * mult).persist()
        corpus.count()
        mt, vocab = bpe_learn_merges(
            corpus, num_merges=64, batch_merges=16, emit_vocab=True
        )
        t0 = time.monotonic()
        n_fast = (
            bpe_token_counts_indexed(corpus, vocab, mt)
            .agg(F.sum("n_bpe_tokens")).collect()[0][0]
        )
        fast_s = time.monotonic() - t0
        t0 = time.monotonic()
        n_full = (
            bpe_apply_indexed(corpus, vocab, mt)
            .agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]
        )
        full_s = time.monotonic() - t0
        corpus.unpersist()
        assert n_fast == n_full, (mult, n_fast, n_full)
        out["points"].append({
            "docs": 20000 * mult,
            "counts_path_s": round(fast_s, 2),
            "array_regroup_s": round(full_s, 2),
            "tokens": int(n_fast),
        })
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bpe_apply"
    fn = {
        "bpe_apply": probe_bpe_apply,
        "jl_compose": probe_jl_compose,
        "bpe_counts": probe_bpe_counts,
    }[which]
    print(json.dumps({which: fn()}, indent=2))
