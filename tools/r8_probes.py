#!/usr/bin/env python
"""Round-8 scale probes (results → OPERATORS_BENCH.md).

1. composed_ann — d20 (ivf_quantized_topk) vs the flat all-pairs
   quantized_topk (d16) at sf0.1: wall time AND coarse-candidate row
   counts (the number of (query, corpus) pairs the integer dot ever
   touches). The composed layout's claim is that the coarse pass scans
   |probed cells| instead of |corpus| per query — the count is the
   100 TB argument, the wall is the local confirmation.

2. lm_buckets_scale — d21's value-bucketed two-phase global rank at
   sf0.01 vs sf0.1 (10× docs): wall should scale ~linearly (hash aggs +
   parallel bucket windows), never like a single-reducer sort, and the
   bucket-list prefix input stays bounded (distinct value-buckets).

Usage: python tools/r8_probes.py [composed_ann|lm_buckets]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basis_devkit_spark.queries import load
from basis_devkit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _med(fn, n=5):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 3)


def probe_composed_ann(spark) -> dict:
    from basis_devkit_spark.operators.similarity import (
        _assign_cells,
        _with_cell_ranks,
        fit_scalar_quantizer,
        ivf_quantized_topk,
        quantized_topk,
    )

    emb = load(spark, SF_DIR, "embeddings")
    n_corpus = emb.count()
    cents_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    q = emb.filter(F.col("vec_id") < 100)
    quant = fit_scalar_quantizer(emb)

    flat = lambda: quantized_topk(q, emb, k=5, refine=4, quant=quant).count()
    composed = lambda: ivf_quantized_topk(
        q, emb, k=5, nlist=16, nprobe=4, refine=4, centroids=cents_df,
        quant=quant,
    ).count()
    flat_s = _med(flat)
    composed_s = _med(composed)

    # coarse-candidate pair counts: flat = |q| * (|corpus| - 1); composed =
    # sum over queries of |probed cells' members| (minus self) — recompute
    # the cell sizes the operator's equi-join produces.
    assigned, cents = _assign_cells(
        emb, "embedding", "vec_id", "match_id", 16, 42, 100_000, cents_df
    )
    cell_sizes = {
        r["__cell"]: r["n"]
        for r in assigned.groupBy("__cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    qr = _with_cell_ranks(
        q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")),
        cents, F.col("__qv"), "__cr",
    )
    probes = qr.select(
        "query_id",
        F.slice(F.array_sort(F.col("__cr")), 1, 4).alias("__p"),
    ).collect()
    composed_pairs = sum(
        sum(cell_sizes.get(s["cell"], 0) for s in r["__p"]) for r in probes
    )
    n_q = len(probes)
    flat_pairs = n_q * (n_corpus - 1)
    # recall-vs-cost dial: composed top-5 vs the flat quantized reference
    b = {
        (r["query_id"], r["match_id"])
        for r in quantized_topk(q, emb, k=5, refine=4, quant=quant).collect()
    }
    recall = {}
    for nprobe in (4, 8, 12):
        a = {
            (r["query_id"], r["match_id"])
            for r in ivf_quantized_topk(
                q, emb, k=5, nlist=16, nprobe=nprobe, refine=4,
                centroids=cents_df, quant=quant,
            ).collect()
        }
        recall[f"nprobe{nprobe}"] = round(len(a & b) / len(b), 3)
    return {
        "sf": SF_DIR,
        "n_corpus": n_corpus,
        "n_queries": n_q,
        "flat_s": flat_s,
        "composed_s": composed_s,
        "flat_coarse_pairs": flat_pairs,
        "composed_coarse_pairs": composed_pairs,
        "pair_reduction_x": round(flat_pairs / max(1, composed_pairs), 2),
        "recall_vs_flat": recall,
    }


def probe_lm_buckets(spark) -> dict:
    from basis_devkit_spark.operators.text import lm_quality_buckets

    out = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load(spark, sf, "documents")
        n = docs.count()
        wall = _med(lambda: lm_quality_buckets(docs).count(), n=3)
        nb = (
            lm_quality_buckets(docs)
            .select(F.countDistinct(F.floor(-F.col("lm_score") * 1000.0)))
            .collect()[0][0]
        )
        out[sf] = {"docs": n, "wall_s": wall, "distinct_value_buckets": nb}
    return out


def probe_sketches(spark) -> dict:
    """Sketch-relation sizes must stay BOUNDED as data grows — that is
    the whole 100 TB argument: the shuffle/state is m registers or
    depth×width cells regardless of row count."""
    import time as _t

    from basis_devkit_spark.operators.sketches import (
        cms_build,
        hll_registers,
    )
    from basis_devkit_spark.queries import load

    out = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        ev = load(spark, sf, "events")
        n = ev.count()
        t0 = _t.perf_counter()
        regs = hll_registers(ev, "event_id", p=10).count()
        t_hll = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        cells = cms_build(ev, "event_id", width=1 << 14, depth=4).count()
        t_cms = _t.perf_counter() - t0
        out[sf] = {
            "rows": n,
            "hll_registers": regs,
            "hll_wall_s": round(t_hll, 3),
            "cms_cells": cells,
            "cms_wall_s": round(t_cms, 3),
        }
    return out


def probe_bloom(spark) -> dict:
    """d26's screening claim, measured: how many exploded corpus gram
    rows survive the k=4 int-join bloom screen vs reach the exact string
    join unscreened, and the filter's physical size vs the distinct
    benchmark gram set it replaces as the first probe target."""
    import time as _t

    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.dedup import (
        _bloom_screen,
        bloom_build,
        ngram_contamination,
        ngram_contamination_bloom,
        shingle_col,
    )
    from basis_devkit_spark.queries import load

    d = load(spark, SF_DIR, "documents")
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    bench = d.filter(F.col("doc_id") % 20 == 0)
    c = corpus.select(
        F.col("doc_id").alias("__id"),
        F.explode(shingle_col("text", 8)).alias("__s"),
    )
    b_grams = bench.select(
        F.explode(shingle_col("text", 8)).alias("__s")
    ).distinct()
    n_gram_rows = c.count()
    n_bench = b_grams.count()
    m_bits = 1 << 18
    bloom = bloom_build(b_grams, "__s", m_bits, 4)
    survivors = _bloom_screen(c, "__s", bloom, m_bits, 4).count()
    bloom_words = bloom.count()
    t0 = _t.perf_counter()
    plain = ngram_contamination(corpus, bench, shingle_size=8).count()
    t_plain = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    bloomed = ngram_contamination_bloom(
        corpus, bench, shingle_size=8, m_bits=m_bits, k=4
    ).count()
    t_bloom = _t.perf_counter() - t0
    assert plain == bloomed
    return {
        "sf": SF_DIR,
        "corpus_gram_rows": n_gram_rows,
        "bench_distinct_grams": n_bench,
        "bloom_words_64bit": bloom_words,
        "bloom_bytes": bloom_words * 8,
        "screen_survivor_rows": survivors,
        "screen_drop_pct": round(100 * (1 - survivors / n_gram_rows), 2),
        "plain_s": round(t_plain, 3),
        "bloom_s": round(t_bloom, 3),
        "results_equal": True,
    }


def probe_pq(spark) -> dict:
    """d29 PQ-ADC: (a) coarse-artifact bytes — the persisted codes
    relation vs the float vectors it replaces on the coarse scan; (b)
    corpus-scale wall — coarse+rescore at 1× vs 16× corpus (new ids, same
    queries): linear is the pass grade; (c) result invariance — the 1×
    answer is byte-identical under repartitioning (integer coarse pass),
    and every 1× candidate's integer distance is unchanged by the 16×
    blow-up (scores are per-pair, corpus-size-independent)."""
    import shutil
    import tempfile

    from basis_devkit_spark.operators.similarity import (
        fit_pq_codebook,
        pq_encode,
        pq_topk,
    )

    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 30)
    cb = fit_pq_codebook(emb, m=8, ksub=16)
    tmp = tempfile.mkdtemp(prefix="pq_probe_")
    try:
        emb.select("vec_id", "embedding").write.mode("overwrite").parquet(
            f"{tmp}/floats"
        )
        pq_encode(emb, cb, m=8, ksub=16).select("vec_id", "pq_codes").write.mode(
            "overwrite"
        ).parquet(f"{tmp}/codes")

        def du(p):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
                if f.endswith(".parquet")
            )

        bytes_floats, bytes_codes = du(f"{tmp}/floats"), du(f"{tmp}/codes")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    key = lambda rows: sorted(
        (r["query_id"], r["match_id"], r["score"], r["rank"]) for r in rows
    )
    base = pq_topk(q, emb, k=5, m=8, ksub=16, refine=4).collect()
    repart = pq_topk(
        q, emb.repartition(13), k=5, m=8, ksub=16, refine=4
    ).collect()
    invariant = key(base) == key(repart)
    wall_1x = _med(lambda: pq_topk(q, emb, k=5, m=8, ksub=16, refine=4).count())
    n = emb.count()
    big = emb
    for i in range(1, 16):
        big = big.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n))
        )
    big = big.repartition(32).persist()
    big.count()
    try:
        wall_16x = _med(
            lambda: pq_topk(q, big, k=5, m=8, ksub=16, codebook=cb, refine=4).count(),
            n=3,
        )
    finally:
        big.unpersist()
    return {
        "probe": "pq",
        "sf_dir": SF_DIR,
        "corpus_rows": n,
        "bytes_float_vectors": bytes_floats,
        "bytes_pq_codes": bytes_codes,
        "bytes_ratio": round(bytes_floats / max(bytes_codes, 1), 2),
        "wall_1x_s": wall_1x,
        "wall_16x_s": wall_16x,
        "scale_ratio_16x": round(wall_16x / wall_1x, 2),
        "repartition_invariant": invariant,
    }


def probe_bpe(spark) -> dict:
    """d30 BPE: the iteration state is the distinct-word relation, not
    the corpus — report corpus tokens vs distinct words at two scales
    (the vocab-bounded claim), and the duplication invariance: a 2×
    corpus (every doc twice) must learn the IDENTICAL merge sequence
    with exactly doubled pair counts (pure-integer pipeline)."""
    from basis_devkit_spark.operators.bpe import _word_weights, bpe_learn_merges

    out: dict = {"probe": "bpe"}
    for sf in ("/root/testdata/sf0.01", SF_DIR):
        docs = load(spark, sf, "documents")
        words = _word_weights(docs, "text").persist()
        n_words = words.count()
        n_tokens = int(words.agg(F.sum("weight")).collect()[0][0])
        t0 = time.perf_counter()
        merges = bpe_learn_merges(docs, "text", num_merges=8, words=words)
        rows = merges.collect()
        wall = round(time.perf_counter() - t0, 3)
        words.unpersist()
        tag = sf.rsplit("sf", 1)[1]
        out[f"sf{tag}"] = {
            "corpus_tokens": n_tokens,
            "distinct_words": n_words,
            "vocab_fraction": round(n_words / n_tokens, 4),
            "wall_8_merges_s": wall,
        }
    docs = load(spark, SF_DIR, "documents")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    )
    m1 = [tuple(r) for r in bpe_learn_merges(docs, "text", num_merges=8).collect()]
    m2 = [
        tuple(r) for r in bpe_learn_merges(doubled, "text", num_merges=8).collect()
    ]
    out["duplication_invariant"] = all(
        a[:4] == b[:4] and b[4] == 2 * a[4] for a, b in zip(m1, m2)
    ) and len(m1) == len(m2) == 8
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "composed_ann"
    spark = get_spark()
    if which == "composed_ann":
        print(json.dumps(probe_composed_ann(spark)))
    elif which == "lm_buckets":
        print(json.dumps(probe_lm_buckets(spark)))
    elif which == "sketches":
        print(json.dumps(probe_sketches(spark)))
    elif which == "bloom":
        print(json.dumps(probe_bloom(spark)))
    elif which == "pq":
        print(json.dumps(probe_pq(spark)))
    elif which == "bpe":
        print(json.dumps(probe_bpe(spark)))
    else:
        raise SystemExit(f"unknown probe {which}")
