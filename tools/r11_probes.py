#!/usr/bin/env python
"""Round-11 scale probes.

``jl_structured``: d38's recall-evidence gap (r10 VERDICT "What's wrong"
#2). The shipped sf* embeddings are i.i.d. random 64-d vectors — the
documented worst case for a JL dimension cut (no low-dimensional
structure to preserve; every direction carries equal neighbor
information, so projecting 64 → 16 throws away 3/4 of it). Real
embedding corpora live on low-intrinsic-dimension manifolds (cluster
structure from topics/languages/domains). This probe plants that
structure deterministically — ``n_centers`` Gaussian centers in 64-d,
each point = its center + small isotropic noise — and measures
recall@k of d38 (``jl_ivf_quantized_topk``) across ``out_dim`` x
``refine`` against exact brute force, with d20
(``ivf_quantized_topk``, no JL) and the random fixture as the two
controls. The outcome feeds the pytest recall floor
(``test_jl_ivf_topk_recall_on_structured_fixture``) and the operator
docstring's guidance table.

Run: ``python tools/r11_probes.py jl_structured``
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark():
    from basis_devkit_spark import get_spark

    return get_spark()


def clustered_embeddings(
    spark,
    n: int = 2000,
    dim: int = 64,
    n_centers: int = 16,
    noise: float = 0.25,
    seed: int = 11,
):
    """Deterministic planted-cluster fixture: ``n_centers`` unit-ish
    Gaussian centers, each row = center(i mod n_centers) + N(0, noise²)
    per component. Intrinsic dimension ≈ n_centers ≪ dim — the manifold
    shape JL preserves. float32 column like the shipped embeddings."""
    rng = random.Random(seed)
    centers = [
        [rng.gauss(0, 1.0) for _ in range(dim)] for _ in range(n_centers)
    ]
    rows = [
        (
            i,
            [
                c + rng.gauss(0, noise)
                for c in centers[i % n_centers]
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(16)


def probe_jl_structured() -> dict:
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.similarity import (
        brute_force_topk,
        ivf_quantized_topk,
        jl_ivf_quantized_topk,
    )

    spark = _spark()
    out = {"fixtures": []}
    rand_emb = spark.read.parquet(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        + "/embeddings.parquet"
    )
    for name, emb in (
        ("structured_16c", clustered_embeddings(spark)),
        ("random_sf", rand_emb),
    ):
        emb = emb.persist()
        n = emb.count()
        q = emb.filter(F.col("vec_id") < 30)
        exact = {
            (r["query_id"], r["match_id"])
            for r in brute_force_topk(q, emb, k=5).collect()
        }

        def recall(df):
            got = {(r["query_id"], r["match_id"]) for r in df.collect()}
            return round(len(got & exact) / len(exact), 3)

        fx = {"fixture": name, "rows": n, "points": []}
        # d20 control at every refine the d38 grid uses — recall is
        # driven by BOTH the coarse space and the candidate budget, so
        # the only honest d38-vs-d20 comparison holds refine equal
        for refine in (4, 16, 32):
            t0 = time.monotonic()
            r = recall(
                ivf_quantized_topk(
                    q, emb, k=5, nlist=8, nprobe=4, refine=refine
                )
            )
            fx["points"].append(
                {
                    "op": "d20",
                    "refine": refine,
                    "recall": r,
                    "wall_s": round(time.monotonic() - t0, 2),
                }
            )
        for out_dim in (8, 16, 32):
            for refine in (4, 16, 32):
                t0 = time.monotonic()
                r = recall(
                    jl_ivf_quantized_topk(
                        q, emb, k=5, out_dim=out_dim, nlist=8,
                        nprobe=4, refine=refine,
                    )
                )
                fx["points"].append(
                    {
                        "op": "d38",
                        "out_dim": out_dim,
                        "refine": refine,
                        "recall": r,
                        "wall_s": round(time.monotonic() - t0, 2),
                    }
                )
        emb.unpersist()
        out["fixtures"].append(fx)
    return out


def probe_pack_append() -> dict:
    """c23's scale claim with data: appending a new crawl batch to an
    already-packed corpus costs BATCH-sized work (one batch prefix +
    a one-row cursor read), while the only alternative before r11 —
    full repack — costs CORPUS-sized work that grows with history.
    Measured as layout-compute wall (collect of the layout rows) for a
    fixed 5k-doc batch arriving on top of growing packed history."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.text import (
        sequence_pack,
        sequence_pack_append,
    )

    spark = _spark()
    rng = random.Random(3)
    batch_n = 5_000

    def corpus(n, start=0):
        rows = [
            (i, " ".join("w%d" % rng.randint(0, 500) for _ in range(60)))
            for i in range(start, start + n)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(32)

    out = {"batch_docs": batch_n, "points": []}
    for hist_n in (20_000, 80_000, 320_000):
        hist = corpus(hist_n).persist()
        cursor = (
            sequence_pack(hist, budget=2048)
            .agg(
                F.max(
                    F.col("seq_id") * 2048 + F.col("seq_offset")
                    + F.col("n_tokens")
                )
            )
            .collect()[0][0]
        )
        batch = corpus(batch_n, start=hist_n).persist()
        batch.count()

        def force(layout):
            # count() alone lets Catalyst prune the whole prefix
            # computation; aggregate the COMPUTED columns instead
            r = layout.agg(
                F.count(F.lit(1)), F.max("seq_id"), F.sum("seq_offset")
            ).collect()[0]
            return int(r[0])

        t0 = time.monotonic()
        n_inc = force(
            sequence_pack_append(batch, 2048, cursor_tokens=int(cursor))
        )
        inc_s = time.monotonic() - t0
        full = hist.unionByName(batch)
        t0 = time.monotonic()
        n_full = force(sequence_pack(full, budget=2048))
        full_s = time.monotonic() - t0
        hist.unpersist()
        batch.unpersist()
        assert n_inc == batch_n and n_full == hist_n + batch_n
        out["points"].append(
            {
                "history_docs": hist_n,
                "append_s": round(inc_s, 2),
                "full_repack_s": round(full_s, 2),
            }
        )
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "jl_structured"
    fn = {
        "jl_structured": probe_jl_structured,
        "pack_append": probe_pack_append,
    }[which]
    print(json.dumps({which: fn()}, indent=2))
