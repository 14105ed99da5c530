"""Physical-plan quality gates (SURVEY §4, 100 TB posture): these assert
the *shape* of the plan, not the result — pushdown reaching the scan,
broadcasts chosen for small dims, bounded shuffle counts for the custom
operators. A plan regression here is a scale bug even when results match.
"""

import re

import pytest
from pyspark.sql import functions as F

from basis_devkit_spark.operators import as_of_join, minhash_signatures, range_join
from basis_devkit_spark.queries import load

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ) if hasattr(df._sc._jvm, "PythonSQLUtils") else plan_of(df)


def n_shuffles(df) -> int:
    return plan_of(df).count("Exchange hashpartitioning") + plan_of(df).count(
        "Exchange rangepartitioning"
    )


def test_filter_and_projection_push_to_scan(spark):
    df = (
        load(spark, SF, "lineitem")
        .filter((F.col("l_quantity") < 10) & (F.col("l_shipdate") >= "1998-01-01"))
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "LessThan(l_quantity,10" in plan.replace(" ", "")
    # column pruning: read schema must not include unused columns
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "l_extendedprice" not in m.group(1)


def test_small_dim_join_is_broadcast(spark):
    n = load(spark, SF, "nation")
    r = load(spark, SF, "region")
    joined = n.join(r, n.n_regionkey == r.r_regionkey)
    assert "BroadcastHashJoin" in plan_of(joined)


def test_broadcast_hint_respected(spark):
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders")
    joined = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
    assert "BroadcastHashJoin" in plan_of(joined)


def test_groupby_has_partial_aggregation(spark):
    df = load(spark, SF, "lineitem").groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = plan_of(df)
    # two HashAggregates (partial + final) around one exchange = map-side combine
    assert plan.count("HashAggregate") >= 2
    assert n_shuffles(df) == 1


def test_asof_join_single_shuffle(spark):
    """The union+window as-of join must cost exactly one hash exchange
    (by key), never a nested-loop join."""
    ev = load(spark, SF, "events")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("value").alias("v")
    )
    joined = as_of_join(purchases, clicks, on="user_id", left_ts="ts", value_cols=["v"])
    plan = plan_of(joined)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert n_shuffles(joined) == 1


def test_range_join_no_nested_loop(spark):
    ev = load(spark, SF, "events")
    a = ev.filter("event_type = 'click'").select("user_id", F.col("ts").alias("a_ts"))
    b = ev.filter("event_type = 'error'").select("user_id", F.col("ts").alias("b_ts"))
    joined = range_join(a, b, on="user_id", left_ts="a_ts", right_ts="b_ts")
    plan = plan_of(joined)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_single_shuffle_no_python_udf(spark):
    """Uncapped signatures are a pure projection (ZERO shuffles — per-row
    array_min/transform); the stop-shingle-capped path needs corpus doc
    frequencies and gets exactly one groupBy shuffle (plus the cap's own
    frequency agg + broadcast anti-join). No Python in either."""
    docs = load(spark, SF, "documents")
    sig = minhash_signatures(docs, "doc_id", "text", num_hashes=16)
    plan = plan_of(sig)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "ArrowEvalPython" not in plan  # not even a pandas UDF
    assert n_shuffles(sig) == 0

    capped = minhash_signatures(
        docs, "doc_id", "text", num_hashes=16, max_shingle_df=100
    )
    plan_c = plan_of(capped)
    assert "BatchEvalPython" not in plan_c and "ArrowEvalPython" not in plan_c
    assert n_shuffles(capped) == 2  # doc-frequency agg + signature groupBy


def test_ngram_counts_plan_shape(spark):
    """Top-k n-grams: partial-combining hash agg (map-side combine on
    repeated grams), global top-k via TakeOrdered (no full sort of the
    gram table), no Python anywhere."""
    from basis_devkit_spark.operators.text import ngram_counts

    docs = load(spark, SF, "documents")
    df = ngram_counts(docs, "text", n=2, k=50)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cross_doc_dup_frac_uses_semi_join(spark):
    """The shared-gram filter joins back as a LEFT SEMI (existence only —
    never materializes gram payloads on the probe side) with no Python."""
    from basis_devkit_spark.operators.text import cross_doc_dup_ngram_frac

    docs = load(spark, SF, "documents")
    df = cross_doc_dup_ngram_frac(docs, "doc_id", "text", n=3)
    plan = plan_of(df)
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_documents_is_shuffle_free(spark):
    """Chunking is a projection + generate — zero exchanges, no Python."""
    from basis_devkit_spark.operators.text import chunk_documents

    docs = load(spark, SF, "documents")
    df = chunk_documents(docs, chunk_tokens=40, overlap=10)
    plan = plan_of(df)
    assert n_shuffles(df) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_budget_sample_bucketed_prefix(spark):
    """The data-level running sum must window by (stratum, bucket) — fully
    parallel — and no Python anywhere. The only single-partition stage
    allowed is the bucket-level cumsum over the tiny (strata x buckets)
    table; the full data is never collapsed to one partition."""
    from basis_devkit_spark.operators.text import token_budget_sample

    docs = load(spark, SF, "documents")
    df = token_budget_sample(docs, {"en": 1000}, stratum_col="lang")
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the within-bucket window partitions by (lang, __b)
    assert re.search(r"windowspecdefinition\(lang#\d+, __b#\d+", plan), plan
    assert plan.count("Exchange SinglePartition") <= 1  # tiny bucket table only
    assert df.count() > 0


def test_stream_cursor_filter_pushdown(spark, tmp_path):
    """The stream's strictly-greater cursor filter must reach the scan."""
    from basis_devkit_spark.node import Table
    from basis_devkit_spark.storage.store import TableStore

    store = TableStore(str(tmp_path), "events", spark)
    store.write_replace(load(spark, SF, "events"))
    t = Table("events", "r")
    t.bind(store, spark)
    df = t.as_stream(order_by="event_id", starting_value=500).read_dataframe()
    plan = plan_of(df)
    assert "PushedFilters" in plan and "GreaterThan(event_id,500" in plan.replace(" ", "")


def test_topk_global_uses_take_ordered(spark):
    df = (
        load(spark, SF, "orders")
        .orderBy(F.col("o_totalprice").desc())
        .limit(10)
    )
    assert "TakeOrderedAndProject" in plan_of(df)


def test_partitioned_store_read_prunes_partitions(spark, tmp_path):
    """A store configured with partition_by writes hive-style directories;
    a filter on the partition column must prune at the file index (shown as
    PartitionFilters on the scan), reading only the matching directory —
    the mechanism that scopes cursor reads and upsert merges at 100 TB."""
    from basis_devkit_spark.storage.store import TableStore

    store = TableStore(str(tmp_path), "orders", spark)
    store.configure(partition_by="o_orderstatus")
    store.write_replace(
        load(spark, SF, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
    )
    df = store.read().filter(F.col("o_orderstatus") == "O")
    plan = formatted(df)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    # Correctness of the pruned read
    expected = (
        load(spark, SF, "orders").filter(F.col("o_orderstatus") == "O").count()
    )
    assert df.count() == expected


def test_contamination_broadcasts_benchmark(spark):
    """Decontamination must broadcast the benchmark gram set and never
    shuffle-join the corpus grams (the 100 TB-side invariant)."""
    from basis_devkit_spark.operators.dedup import ngram_contamination
    from pyspark.sql import functions as F

    docs = load(spark, SF, "documents")
    out = ngram_contamination(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        shingle_size=3,
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_stratified_sample_no_window_two_phase_topk(spark):
    """stratified_sample must use the two-phase top-k aggregation (local
    top-k per partition -> per-group merge), never a Window row_number —
    a window puts each whole group through one reducer, the skew-killer
    at corpus scale."""
    from basis_devkit_spark.operators.text import stratified_sample

    docs = load(spark, SF, "documents").select("source", "doc_id", "n_chars")
    df = stratified_sample(docs, "source", 5)
    plan = plan_of(df)
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2  # partial + final phases


def test_normalize_text_pure_projection(spark):
    """normalize_text is a zero-shuffle projection."""
    from basis_devkit_spark.operators.text import normalize_text

    docs = load(spark, SF, "documents")
    df = normalize_text(docs, "text")
    assert n_shuffles(df) == 0


def test_ivf_deterministic_quantizer_plan(spark):
    """With injected centroids, IVF assignment and probing are pure
    projections (no Window, no crossJoin of corpus x centroids); the only
    join is candidate-cell matching."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.similarity import ivf_topk

    emb = load(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    df = ivf_topk(emb.filter(F.col("vec_id") < 5), emb, k=5, nlist=8, nprobe=4,
                  centroids=cents)
    plan = plan_of(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_tpch_q5_two_shuffles_broadcast_dims(spark):
    """b59: region->nation->supplier folds into ONE broadcast; the only
    hash exchanges are the two fact joins (orders><customer on custkey,
    lineitem><co on orderkey) + the final agg — the plan that survives a
    100TB fact table."""
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b59_tpch_q5_regional_revenue"].spark(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # 2 fact-join exchanges + 1 partial/final agg exchange, nothing more
    assert n_shuffles(df) <= 3, plan
    assert plan.count("HashAggregate") >= 2  # map-side combine on the agg


def test_tpch_q10_broadcast_customer_dim(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b60_tpch_q10_returned_items"].spark(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-20 never global-sorts


def test_minhash_dedup_against_plan_shape(spark):
    """d02h incremental dedup: no Python UDF, no cartesian/NLJ — the
    corpus meets the new batch only through the band-bucket equi-join."""
    from basis_devkit_spark.operators.dedup import minhash_dedup_against

    docs = load(spark, SF, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    out = minhash_dedup_against(new, corpus, "doc_id", "text")
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_plan_shape(spark):
    """d02g with injected centroids: assignment is a projection (no
    window, no cartesian); cells meet only via the equi-self-join."""
    from basis_devkit_spark.operators.similarity import semantic_dup_pairs

    emb = load(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    out = semantic_dup_pairs(emb, threshold=0.9, centroids=cents)
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # assignment never windows


def test_tpch_q18_map_side_combine_and_semi(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b61_tpch_q18_large_orders"].spark(spark, SF)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2  # big-order agg combines map-side
    assert "TakeOrderedAndProject" in plan   # top-20 without global sort


def test_tpch_q7_broadcasts_both_nation_dims(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b63_tpch_q7_nation_trade"].spark(spark, SF)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 2  # supplier-side and customer-side dims
    # the only hash exchanges: lineitem><orders + final agg
    assert n_shuffles(df) <= 3, plan


def test_tpch_q19_disjunction_prunes_scan(spark):
    """The OR-of-conjuncts filter must not block column pruning or the
    broadcast join; each scan reads only needed columns."""
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b64_tpch_q19_disjunctive_filter"].spark(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    import re
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li_scan = next(s for s in scans if "l_partkey" in s)
    assert set(c.split(":")[0] for c in li_scan.split(",")) == {
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    }, li_scan


def test_tpch_q4_semi_join_with_residual_date_condition(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b65_tpch_q4_priority_check"].spark(spark, SF)
    plan = plan_of(df)
    # correlated EXISTS must become a semi hash join, never a nested loop
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # orders date filter pushes into its scan
    assert "PushedFilters" in plan


def test_tpch_q21_double_quantifier_no_nested_loop(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b70_tpch_q21_waiting_supplier"].spark(spark, SF)
    plan = plan_of(df)
    # EXISTS → semi, NOT EXISTS → anti; both as hash joins with residual
    # non-equi conditions on the equi key l_orderkey
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q17_lineitem_never_shuffles(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b67_tpch_q17_small_qty_revenue"].spark(spark, SF)
    plan = plan_of(df)
    # the decorrelated per-part AVG joins back via broadcast: the outer
    # lineitem scan reaches the final agg without an Exchange of its own
    # (the only hash exchange allowed is the one building the broadcast
    # per-part dim)
    assert plan.count("BroadcastHashJoin") >= 2
    assert n_shuffles(df) <= 1


def test_gopher_rules_single_projection_no_shuffle(spark):
    from basis_devkit_spark.operators.text import gopher_rules

    df = gopher_rules(load(spark, SF, "documents").select("doc_id", "text"))
    plan = plan_of(df)
    assert n_shuffles(df) == 0
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_sessionize_single_shuffle(spark):
    from basis_devkit_spark.operators.events import sessionize

    df = sessionize(load(spark, SF, "events"))
    assert n_shuffles(df) == 1  # one hash exchange on user_id, reused by both windows
    assert "pythonUDF" not in plan_of(df)


def test_funnel_no_fact_self_join(spark):
    from basis_devkit_spark.operators.events import funnel

    df = funnel(load(spark, SF, "events"), ["view", "click", "purchase"])
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # later steps join fact x user-frame via broadcast hash joins
    assert "BroadcastHashJoin" in plan


def test_tpch_q6_predicates_push_to_scan(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b71_tpch_q6_forecast_revenue"].spark(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "Join" not in plan
    assert n_shuffles(df) <= 1  # partial+final agg exchange only


def test_tpch_q8_fact_spine_single_shuffle_join(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b72_tpch_q8_market_share"].spark(spark, SF)
    plan = plan_of(df)
    # all dim chains broadcast; the only sort-merge-eligible join is the
    # lineitem-orders spine
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_session_paths_takeordered_no_global_sort(spark):
    from basis_devkit_spark.operators.events import session_paths

    df = session_paths(load(spark, SF, "events"), k=20)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "pythonUDF" not in plan


def test_time_gapfill_no_udf_single_window(spark):
    from basis_devkit_spark.operators.timeseries import time_bucket_gapfill

    df = time_bucket_gapfill(load(spark, SF, "events"))
    plan = plan_of(df)
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Window") <= 1  # single LOCF window pass
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", "")


def test_tpch_q9_dims_broadcast_fact_spine(spark):
    from basis_devkit_spark.queries import all_queries

    df = all_queries()["b74_tpch_q9_profit"].spark(spark, SF)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_activity_concentration_no_per_user_rank_window(spark):
    """r5 scale-safe e14: the top-k selection must run over the count
    DISTRIBUTION, never a global rank window over the per-user frame —
    at 1e9 users an unpartitioned row_number is a single-task sort. The
    plan must contain no row_number at all, and the one (bounded-frame)
    running-sum window must sit ABOVE the per-user aggregation."""
    from basis_devkit_spark.operators.events import activity_concentration

    df = activity_concentration(load(spark, SF, "events"), top_fraction=0.1)
    plan = plan_of(df)
    assert "row_number" not in plan
    # the running-sum window input is the (count-value, users) aggregate,
    # so a Window node must appear and HashAggregates must outnumber it
    assert plan.count("Window") >= 1
    assert plan.count("HashAggregate") >= 4  # per-user, dist, totals (partial+final)


def test_sequence_pack_bucketed_prefix(spark):
    """sequence_pack's global running token sum must use the two-pass
    bucketed prefix pattern: the data-level window partitions by __b
    (parallel), and the only single-partition stage is the bucket-level
    cumsum over the tiny bucket table."""
    from basis_devkit_spark.operators.text import sequence_pack

    df = sequence_pack(load(spark, SF, "documents"), budget=512)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert re.search(r"windowspecdefinition\(__b#\d+", plan), plan
    # the only single-partition stage is the tiny non-empty-bucket
    # cumsum; the data-level window above proves the per-doc cumsum is
    # partitioned by __b
    assert plan.count("Exchange SinglePartition") <= 1
    assert df.count() > 0


def test_redact_pii_counted_pure_projection(spark):
    """redact_pii_counted must stay a shuffle-free projection chain that
    fuses into the scan — no exchange, no Python, no window."""
    from basis_devkit_spark.operators.text import redact_pii_counted

    df = redact_pii_counted(load(spark, SF, "documents").select("doc_id", "text"))
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan


def test_ann_join_cell_equi_join_no_cross(spark):
    """ann_join must candidate-generate through a cell EQUI-join: no
    cartesian product, no broadcast nested loop, no Python, and the
    final top-k is the two-phase aggregation (no per-query window
    row_number)."""
    from basis_devkit_spark.operators.similarity import ann_join
    from basis_devkit_spark.queries.analytics import _ivf_seed_centroids

    emb = load(spark, SF, "embeddings")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    df = ann_join(left, right, k=3, nlist=8, nprobe=4,
                  centroids=_ivf_seed_centroids(emb, 8))
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "row_number" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_substring_dedup_plan_shape(spark):
    """d14: no cartesian/nested-loop anywhere (duplicate detection is a
    hash-prefiltered equi-join pipeline) and every Window is partitioned
    by the doc id (interval merge is per-doc, bounded by doc length —
    never a global single-reducer window)."""
    from basis_devkit_spark.operators.dedup import exact_substring_dedup

    df = exact_substring_dedup(
        load(spark, SF, "documents").select("doc_id", "text"), span_tokens=20
    )
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "__id" in line, f"unpartitioned window: {line}"


def test_ann_join_indexed_skips_assignment(spark):
    """d15: querying a persisted ANN index must do NO right-side work
    beyond the candidate equi-join — the cell ASSIGNMENT projection
    (array_min over centroid-distance structs) exists only at build
    time; the query plan carries just the left-side probe (array_sort +
    slice) and no cartesian/NLJ."""
    import tempfile

    from basis_devkit_spark.operators.similarity import (
        ann_index_build,
        ann_join_indexed,
    )
    from basis_devkit_spark.storage.store import TableStore

    emb = load(spark, SF, "embeddings")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    seed_cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    centroids_df, cells = ann_index_build(right, nlist=8, centroids=seed_cents)
    build_plan = plan_of(cells)
    assert "array_min" in build_plan  # assignment happens at build...
    tmp = tempfile.mkdtemp(prefix="bds_annidx_plan_")
    cstore = TableStore(tmp, "cents", spark)
    cstore.write_replace(centroids_df)
    kstore = TableStore(tmp, "cells", spark)
    kstore.configure(partition_by="cell")
    kstore.write_replace(cells)
    q = ann_join_indexed(left, cstore.read(), kstore.read(), k=3, nprobe=4)
    plan = plan_of(q)
    assert "array_min" not in plan, plan  # ...never at query time
    assert "sort_array" in plan or "array_sort" in plan  # left probe remains
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_sketch_and_graphrank_plan_shapes(spark):
    """r8 operators lock their scale shapes: sketch builds are single
    hash-agg pipelines (no window, no cartesian/NLJ); the CMS probe and
    bloom screen join broadcast relations; one PageRank iteration is
    joins + integer aggs only."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.dedup import bloom_build, _bloom_screen
    from basis_devkit_spark.operators.graphrank import pagerank_fixed_point
    from basis_devkit_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        hll_distinct,
    )

    df = spark.range(5000).select(
        F.concat(F.lit("v"), F.col("id") % 700).alias("v")
    )

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    for p in (
        plan(hll_distinct(df, "v", p=8)),
        plan(cms_build(df, "v", width=1 << 10, depth=4)),
    ):
        assert "Window" not in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    cms = cms_build(df, "v", width=1 << 10, depth=4)
    probe_plan = plan(
        cms_estimate(df.limit(50), cms, "v", width=1 << 10, depth=4)
    )
    assert "BroadcastHashJoin" in probe_plan and "Window" not in probe_plan

    bloom = bloom_build(df, "v", m_bits=1 << 12, k=3)
    screen_plan = plan(_bloom_screen(df, "v", bloom, 1 << 12, 3))
    assert screen_plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in screen_plan  # screened frame never shuffles

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    pr_plan = plan(pagerank_fixed_point(edges, iters=1, raw_scaled=True))
    assert "Window" not in pr_plan and "CartesianProduct" not in pr_plan


def test_repetition_signals_plan_shape(spark):
    """d44 scale gates: line signals are per-row HOFs (the only
    exchanges are the bigram hash agg + the doc join — no Window
    anywhere, unlike the oracle's SQL), the (doc, gram) count has a
    map-side partial phase, and no Python eval appears."""
    from basis_devkit_spark.operators.text import repetition_signals

    docs = load(spark, SF, "documents")
    plan = plan_of(repetition_signals(docs))
    assert "Window" not in plan
    assert "partial_count" in plan or "partial_min" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_quality_ecdf_no_source_wide_data_window(spark):
    """D74 scale gate: the per-source ECDF rank must NOT window the
    corpus by source alone (a mega-source would serialize through one
    task's sort) — the data-level window partitions by
    (source, score-bucket); the only source-alone window runs over the
    bounded (source x bucket) COUNT table, which is broadcast back."""
    from basis_devkit_spark.operators.text import (
        quality_ecdf_normalize,
        quality_score,
    )

    docs = quality_score(load(spark, SF, "documents"), "text")
    df = quality_ecdf_normalize(docs)
    plan = plan_of(df)
    # every window that touches the score column (= the corpus-sized
    # data) must be bucket-partitioned
    for line in plan.splitlines():
        if "windowspecdefinition(" in line and "quality_score" in line:
            assert "__vb" in line, f"source-wide data window: {line}"
    assert re.search(
        r"windowspecdefinition\(source#\d+, __vb#\d+", plan
    ), plan
    # bucket-count offsets and per-source totals come back as broadcasts
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _marker_depth(line: str) -> int:
    """Column of the '+-' / ':-' node marker in a physical-plan line
    (-1 for the root line, which has no marker)."""
    for m in ("+- ", ":- "):
        i = line.find(m)
        if i >= 0:
            return i
    return -1


def _exchanges_touching(plan: str, needle: str) -> list[str]:
    """Shuffle-Exchange lines whose SUBTREE (deeper-indented following
    lines) contains ``needle`` — i.e. exchanges that re-shuffle data
    derived from the relation carrying that column."""
    lines = plan.splitlines()
    hits = []
    for i, line in enumerate(lines):
        if "Exchange" not in line or "Broadcast" in line:
            continue
        d = _marker_depth(line)
        sub = [line]
        for j in range(i + 1, len(lines)):
            dj = _marker_depth(lines[j])
            if dj >= 0 and dj <= d:
                break
            sub.append(lines[j])
        if any(needle in s for s in sub):
            hits.append(line.strip())
    return hits


def test_kn_trigram_scoring_stream_max_two_exchanges(spark):
    """D88 scale gate (r14 consolidation): the corpus-sized scoring
    stream must pay at most TWO shuffle Exchanges — the (w1,w2,w3)
    join back to the per-TYPE log-prob and the map-side-combined
    per-doc agg. The five KN count-table lookups run at trigram-TYPE
    level and must never re-shuffle the doc_id-bearing instance
    stream (the r13 shape shuffled it five times). Broadcast is
    disabled so the small-SF plan has the same join strategy the
    100 TB plan would."""
    from basis_devkit_spark.operators.text import kn_trigram_lm_score

    docs = load(spark, SF, "documents").select("doc_id", "text")
    # train side references NO doc_id column anywhere (not even in a
    # filter), so "doc_id#" appearing in an Exchange subtree uniquely
    # identifies the scoring stream
    train = load(spark, SF, "documents").select("text").filter(
        F.length("text") > 10
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = kn_trigram_lm_score(train, docs)
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    stream_ex = _exchanges_touching(plan, "doc_id#")
    assert 1 <= len(stream_ex) <= 2, stream_ex
    # the per-doc agg must partially aggregate map-side
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_decontaminate_levenshtein_above_repartition(spark):
    """D87 scale gate: the O(len²) levenshtein filter must sit ABOVE
    the explicit round-robin repartition in the physical plan — the
    `spark_partition_id() < 0` disjunct pins it there so the CPU-bound
    distance runs wide instead of being pushed into the gram-join
    condition (once per gram MATCH, 13× the evaluations) or serialized
    by AQE byte-based coalescing (measured 326 s → ~13 s at sf0.1).
    If a future Spark/AQE release learns to see through
    nondeterministic disjuncts this fails loudly instead of silently
    re-serializing the stage."""
    from basis_devkit_spark.operators.dedup import fuzzy_decontaminate

    docs = load(spark, SF, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    plan = plan_of(fuzzy_decontaminate(docs, bench))
    lines = plan.splitlines()
    lev_lines = [i for i, l in enumerate(lines) if "levenshtein" in l]
    pin_lines = [
        i
        for i, l in enumerate(lines)
        if "levenshtein" in l and "SPARK_PARTITION_ID" in l
    ]
    rr_lines = [
        i for i, l in enumerate(lines) if "RoundRobinPartitioning" in l
    ]
    assert pin_lines, "partition_id pin disjunct gone from the plan"
    assert rr_lines, "explicit repartition gone from the plan"
    # plan text is parent-above-child: every levenshtein must be above
    # (smaller index than) the round-robin exchange
    assert max(lev_lines) < min(rr_lines), (
        "levenshtein pushed below the repartition barrier:\n"
        + "\n".join(lines[i].strip()[:120] for i in lev_lines)
    )
