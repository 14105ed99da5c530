#!/usr/bin/env python
"""r6 scaling probes: exact-substring dedup replication sweep and
persisted-ANN-index build-vs-query timings (OPERATORS_BENCH.md r6)."""
from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from basis_devkit_spark.operators.dedup import exact_substring_dedup
from basis_devkit_spark.operators.similarity import (
    ann_index_build,
    ann_join,
    ann_join_indexed,
)
from basis_devkit_spark.queries import load
from basis_devkit_spark.session import get_spark


def timed(fn, n=5):
    s = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 3)


def main() -> None:
    spark = get_spark(app_name="r6-probes")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- exact-substring dedup: replicate docs (distinct ids, full-text
    # duplicates) — every replica's entire body is a repeated span chain
    # and must be fully excised; the original (min doc_id) keeps its text.
    docs = load(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    base_n = docs.count()
    probe = {}
    for repl in (1, 4, 16):
        r = spark.range(repl).select(F.col("id").alias("__r"))
        corpus = docs.crossJoin(r).select(
            (F.col("doc_id") + F.col("__r") * 10_000_000).alias("doc_id"), "text"
        )
        corpus.write.mode("overwrite").parquet("/tmp/essd_probe.parquet")
        c = spark.read.parquet("/tmp/essd_probe.parquet")
        out = exact_substring_dedup(c, span_tokens=20)
        agg = lambda: out.groupBy().agg(
            F.sum("n_removed").alias("rm"),
            F.sum(F.when(F.col("text_clean") == "", 1).otherwise(0)).alias("emptied"),
        ).collect()[0]
        row = agg()  # warm + semantics
        probe[f"x{repl}"] = {
            "docs": base_n * repl,
            "tokens_removed": int(row["rm"]),
            "docs_fully_excised": int(row["emptied"]),
            "median_s": timed(agg, 3),
        }
    print(json.dumps({"exact_substring_dedup": probe}))

    # ---- persisted ANN index: one-shot (KMeans fit + assign every call)
    # vs build-once + query-many over the persisted artifact.
    from basis_devkit_spark.storage.store import TableStore

    emb = load(spark, "/root/testdata/sf0.1", "embeddings")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    one_shot = lambda: ann_join(left, right, k=3, nlist=16, nprobe=4).count()
    one_shot()  # warm
    t_one = timed(one_shot, 3)
    tmp = tempfile.mkdtemp(prefix="bds_annidx_probe_")
    t0 = time.perf_counter()
    cents_df, cells = ann_index_build(right, nlist=16)
    cstore = TableStore(tmp, "cents", spark); cstore.write_replace(cents_df)
    kstore = TableStore(tmp, "cells", spark)
    kstore.configure(partition_by="cell"); kstore.write_replace(cells)
    t_build = round(time.perf_counter() - t0, 3)
    cr, kr = cstore.read(), kstore.read()
    q = lambda: ann_join_indexed(left, cr, kr, k=3, nprobe=4).count()
    q()  # warm
    print(json.dumps({"ann_index": {
        "one_shot_s": t_one, "build_once_s": t_build,
        "query_over_index_s": timed(q, 5),
    }}))


if __name__ == "__main__":
    main()
