#!/usr/bin/env python
"""Round-7 scale probes (results → OPERATORS_BENCH.md).

1. ann_probe_compile — the r6 verdict's one flagged 100×-scale flaw:
   literal-centroid probe assignment embeds nlist×dim literal nodes in
   the plan, so Catalyst plan-construction/codegen time grows with the
   quantizer; the r7 broadcast-relation form must be FLAT in nlist.
   Measures executedPlan() build time (plan construct + analyze +
   optimize + physical plan) and first-execution wall for both forms at
   nlist ∈ {16, 64, 256}.

2. ann_cells_compaction — r6 verdict task 6: N streamed ingest batches
   fragment the ANN cells store (files + lineage per upsert); measures
   indexed-query latency as batches accumulate and after compaction.

Usage: python tools/r7_probes.py [compile|compaction]
"""
from __future__ import annotations

import json
import os
import random
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basis_devkit_spark.queries import load
from basis_devkit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def probe_compile(spark) -> dict:
    from basis_devkit_spark.operators.similarity import (
        ann_index_build,
        ann_join_indexed,
    )

    emb = load(spark, SF_DIR, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    out: dict = {"dim": dim, "forms": {}}
    for form in ("literal", "broadcast"):
        rng = random.Random(11)  # identical centroids per form -> identical rows
        rows = {}
        for nlist in (16, 64, 256):
            cents = [
                (j, [rng.gauss(0, 1) for _ in range(dim)]) for j in range(nlist)
            ]
            # compile: plan build + analyze + optimize + physical plan
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, cells = ann_index_build(
                    right, nlist=nlist, centroids=cents, probe_form=form
                )
                q = ann_join_indexed(
                    left, cents, cells, k=3, nprobe=4, probe_form=form
                )
                q._jdf.queryExecution().executedPlan()
                samples.append(time.perf_counter() - t0)
            # first execution (codegen + run)
            t0 = time.perf_counter()
            n = q.count()
            exec_s = time.perf_counter() - t0
            rows[nlist] = {
                "compile_s": round(statistics.median(samples), 3),
                "first_exec_s": round(exec_s, 3),
                "rows": n,
            }
        out["forms"][form] = rows
    return out


def probe_compaction(spark) -> dict:
    """Streamed-ingest fragmentation: append N micro-batches into the ANN
    cells store via upsert, timing an indexed query after each; then
    compact and re-measure. The query must return identical results
    before/after compaction (asserted)."""
    from basis_devkit_spark.operators.similarity import (
        ann_index_assign,
        ann_index_build,
        ann_join_indexed,
    )
    from basis_devkit_spark.storage.store import TableStore

    emb = load(spark, SF_DIR, "embeddings")
    left = emb.filter(F.col("vec_id") % 7 == 0).limit(50)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    seed_cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    centroids_df, _ = ann_index_build(right, nlist=8, centroids=seed_cents)
    cents = [
        (int(r["cell"]), [float(x) for x in r["center"]])
        for r in centroids_df.collect()
    ]
    tmp = tempfile.mkdtemp(prefix="bds_r7_compact_")
    # Two ingest modes, two different fragmentation stories:
    # - append (default): each micro-batch lands in a NEW lineage dir
    #   (cheap write, lineage grows linearly) — the read path fragments
    #   and compact() is the recovery; batches carry disjoint vec_ids so
    #   append and upsert produce the same table.
    # - upsert: copy-on-write MERGE commits a fresh single-dir version
    #   per batch — the read path NEVER fragments (active lineage stays
    #   one dir); the costs move to write amplification and dead-version
    #   disk (vacuum's job), not query latency.
    mode = os.environ.get("SPARK_GRAFT_COMPACT_MODE", "append")
    kstore = TableStore(tmp, "cells", spark)
    kstore.configure(partition_by="cell", unique_on="vec_id")
    n_batches = int(os.environ.get("SPARK_GRAFT_COMPACT_BATCHES", "12"))
    curve = []

    def active_files() -> int:
        """Parquet files in the ACTIVE version's lineage — what a query
        actually opens (the copy-on-write tree also holds dead versions
        that only vacuum removes; counting those overstates read cost)."""
        n = 0
        for d in kstore._version_dirs(kstore._manifest.active_version):
            for _, _, fs in os.walk(os.path.join(kstore.path, d)):
                n += len([f for f in fs if f.endswith(".parquet")])
        return n

    def query_latency() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        ann_join_indexed(left, cents, kstore.read(), k=3, nprobe=4).count()
        return time.perf_counter() - t0

    # split the right corpus into n_batches slices and stream them in
    # (right holds ODD vec_ids, so slice on vec_id % (2*n_batches) ==
    # 2b+1 — every slice non-empty and the union covers right exactly)
    for b in range(n_batches):
        batch = right.filter(F.col("vec_id") % (2 * n_batches) == 2 * b + 1)
        rows = ann_index_assign(batch, cents)
        if b == 0:
            kstore.write_replace(rows)
        elif mode == "append":
            kstore.append(rows)
        else:
            kstore.upsert(rows)
        curve.append(
            {
                "batch": b + 1,
                "files": active_files(),
                "query_s": round(query_latency(), 3),
            }
        )
    before = {
        tuple(r)
        for r in ann_join_indexed(left, cents, kstore.read(), k=3, nprobe=4).collect()
    }
    t0 = time.perf_counter()
    kstore.compact()
    compact_s = time.perf_counter() - t0
    after_lat = [round(query_latency(), 3) for _ in range(3)]
    after = {
        tuple(r)
        for r in ann_join_indexed(left, cents, kstore.read(), k=3, nprobe=4).collect()
    }
    assert before == after, "compaction changed query results"
    return {
        "mode": mode,
        "curve": curve,
        "compact_s": round(compact_s, 3),
        "post_compact_files": active_files(),
        "post_compact_query_s": statistics.median(after_lat),
        "results_invariant": True,
    }


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across all completed stages (UI REST)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def probe_substring_shuffle(spark) -> dict:
    """r6 verdict task 4 evidence: the slim suspect phase (8-byte sigs +
    rebuilt spans + combinable sig-keyed verify) vs the r6 shape that
    shuffled a full ~span_tokens-token string per suspect occurrence.
    Corpus: sf0.1 documents replicated 16x with distinct ids — the
    adversarial all-duplicate case where EVERY position is a suspect.
    The r6 shape is reconstructed inline (occurrence-level __span carried
    through the semi-join and both phase-2 joins) so both run in this
    same process; results are asserted identical."""
    from pyspark.sql.window import Window

    from basis_devkit_spark.operators.dedup import duplicate_span_intervals

    docs = load(
        spark, os.environ.get("SPARK_GRAFT_SUB_SF", "/root/testdata/sf0.1"),
        "documents",
    ).select("doc_id", "text")
    L = 20

    def legacy_intervals(df):
        # the r6 shape: span strings ride every suspect row
        toks = F.split(F.trim(F.col("text")), r"\s+")
        base = df.select(F.col("doc_id").alias("__id"), toks.alias("__toks"))
        sh = (
            base.filter(F.size("__toks") >= L)
            .select(
                "__id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("__toks") - L),
                        lambda i: F.struct(
                            i.alias("pos"),
                            F.array_join(F.slice("__toks", i + 1, L), " ").alias("span"),
                        ),
                    )
                ).alias("__sh"),
            )
            .select("__id", F.col("__sh.pos").alias("__pos"), F.col("__sh.span").alias("__span"))
            .withColumn("__sig", F.xxhash64("__span"))
        )
        dup_sigs = (
            sh.groupBy("__sig").agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") >= 2).select("__sig")
        )
        suspects = sh.join(dup_sigs, "__sig", "left_semi")
        dup_spans = (
            suspects.groupBy("__span")
            .agg(
                F.count(F.lit(1)).alias("__n_occ"),
                F.min(F.struct(F.col("__id").alias("i"), F.col("__pos").alias("p"))).alias("__keep"),
            )
            .filter(F.col("__n_occ") >= 2)
            .select("__span", "__keep")
        )
        excise = (
            suspects.join(dup_spans, "__span")
            .filter((F.col("__id") != F.col("__keep.i")) | (F.col("__pos") != F.col("__keep.p")))
            .select("__id", F.col("__pos").alias("s"), (F.col("__pos") + L).alias("e"))
        )
        w = Window.partitionBy("__id").orderBy("s", "e")
        prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
        grouped = excise.withColumn(
            "__new", (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("int")
        ).withColumn(
            "__grp", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        return (
            grouped.groupBy("__id", "__grp")
            .agg(F.min("s").alias("s"), F.max("e").alias("e"))
            .select(F.col("__id").alias("doc_id"), "s", "e")
        )

    out_all = {}
    for repl in (1, 16):
        r = spark.range(repl).select(F.col("id").alias("__r"))
        corpus = docs.crossJoin(r).select(
            (F.col("doc_id") + F.col("__r") * 10_000_000).alias("doc_id"), "text"
        )
        corpus.write.mode("overwrite").parquet("/tmp/essd_r7_probe.parquet")
        c = spark.read.parquet("/tmp/essd_r7_probe.parquet")
        out_all[f"x{repl}"] = _substring_one(spark, c, L, legacy_intervals)
    return out_all


def _substring_one(spark, c, L, legacy_intervals) -> dict:
    from basis_devkit_spark.operators.dedup import duplicate_span_intervals

    out = {}
    results = {}
    for name, build in (
        ("r7_slim", lambda: duplicate_span_intervals(c, span_tokens=L)),
        ("r6_span_shuffle", lambda: legacy_intervals(c)),
    ):
        mk = lambda: build().groupBy().agg(
            F.count(F.lit(1)).alias("n_iv"),
            F.sum(F.col("e") - F.col("s")).alias("tok"),
        )
        mk().collect()  # warm codegen/JIT
        # REBUILD the plan for the timed run: re-collecting the same
        # DataFrame instance reuses its shuffle files (stages skip),
        # which would time — and meter — nothing.
        spark.catalog.clearCache()
        b0 = _shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        row = mk().collect()[0]
        wall = time.perf_counter() - t0
        bytes_w = _shuffle_write_bytes(spark) - b0
        results[name] = (int(row["n_iv"]), int(row["tok"]))
        out[name] = {
            "wall_s": round(wall, 2),
            "shuffle_write_mb": round(bytes_w / 1e6, 1),
            "intervals": int(row["n_iv"]),
            "tokens_excised": int(row["tok"]),
        }
    assert results["r7_slim"] == results["r6_span_shuffle"], results
    out["results_identical"] = True
    out["shuffle_reduction_x"] = round(
        out["r6_span_shuffle"]["shuffle_write_mb"]
        / max(out["r7_slim"]["shuffle_write_mb"], 0.1),
        1,
    )
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="r7-probes")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    if which in ("compile", "all"):
        out["ann_probe_compile"] = probe_compile(spark)
    if which in ("compaction", "all"):
        out["ann_cells_compaction"] = probe_compaction(spark)
    if which in ("substring", "all"):
        out["substring_suspect_shuffle"] = probe_substring_shuffle(spark)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
