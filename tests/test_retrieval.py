"""Lexical & hybrid retrieval (operators/retrieval.py): BM25 + RRF."""

import math

import pytest
from pyspark.sql import functions as F

from basis_devkit_spark.operators.retrieval import bm25_topk, rrf_fuse


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join fast spark"),
            (2, "slow scan table"),
            (3, "spark table table join join"),
            (4, "vector vector vector"),
            (5, None),
        ],
        "doc_id long, text string",
    )


def _bm25_expected(corpus, terms, k1=1.2, b=0.75):
    toked = {i: (t or "").lower().split(" ") for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(w) for w in toked.values()) / n
    out = {}
    for i, ws in toked.items():
        s = 0.0
        for t in terms:
            tf = float(ws.count(t))
            df = sum(1 for w in toked.values() if t in w)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(ws) / avgdl)))
        out[i] = round(s, 4)
    return out


def test_bm25_matches_hand_model(spark, docs):
    corpus = [(r["doc_id"], r["text"]) for r in docs.collect()]
    terms = ["spark", "join"]
    want = _bm25_expected(corpus, terms)
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, terms, k=10).collect()}
    # only docs with positive score appear
    assert set(got) == {i for i, s in want.items() if s > 0}
    for i, s in got.items():
        assert s == pytest.approx(want[i], abs=1e-4), i
    ranks = {r["doc_id"]: r["rank"] for r in bm25_topk(docs, terms, k=10).collect()}
    ordered = sorted(got, key=lambda i: (-got[i], i))
    assert [ranks[i] for i in ordered] == list(range(1, len(ordered) + 1))


def test_bm25_null_text_and_empty_terms(spark, docs):
    # null text coalesces to '' and simply never matches; empty terms error
    res = bm25_topk(docs, ["spark"], k=10).collect()
    assert 5 not in {r["doc_id"] for r in res}
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_plan_is_take_ordered(spark, docs):
    """Corpus top-k must be TakeOrderedAndProject (no global sort of the
    scored corpus); the only nested-loop join is the documented
    single-row stats broadcast."""
    plan = (
        bm25_topk(docs, ["spark", "join"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    bnlj = [ln for ln in plan.splitlines() if "BroadcastNestedLoopJoin" in ln]
    assert len(bnlj) <= 1
    # the rank window runs over the post-limit rows, not the corpus: no
    # corpus-wide Exchange hashpartitioning feeding a Window
    assert "CartesianProduct" not in plan


def test_rrf_fuse_hand_model(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank int")
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in rrf_fuse([a, b], k=10).collect()}
    want = {
        1: 1 / 61 + 1 / 62,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        9: 1 / 63,
    }
    assert set(got) == set(want)
    for i, (s, _) in got.items():
        assert s == pytest.approx(round(want[i], 6), abs=1e-6)
    # rank ordering: fused score desc, id asc
    order = sorted(want, key=lambda i: (-round(want[i], 6), i))
    assert [got[i][1] for i in order] == [1, 2, 3, 4]


def test_rrf_fuse_k_cut_and_single_ranking(spark):
    a = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc_id long, rank int")
    top3 = rrf_fuse([a], k=3).collect()
    assert [r["doc_id"] for r in sorted(top3, key=lambda r: r["rank"])] == [1, 2, 3]
    with pytest.raises(ValueError):
        rrf_fuse([])
