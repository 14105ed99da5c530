"""Differential harness mimicking the driver's correctness gate: run every
declared query through Spark AND its DuckDB oracle at the test SF, compare
row count, schema (column names), and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

# Literal-table oracles (pyoracle.py) must model the SF this test runs at.
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 6)
    if isinstance(val, (list, tuple)):
        return tuple(_canon(v) for v in val)
    if hasattr(val, "isoformat"):
        return val.isoformat()
    import decimal

    if isinstance(val, decimal.Decimal):
        return round(float(val), 6)
    return val


def _canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    # repr-key: total order even with None/mixed types; identical on both sides
    return sorted(canon, key=repr)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir):
    q = QUERIES[name]
    got_df = q(spark, sf_dir)
    got_cols = got_df.columns
    got_rows = [tuple(r) for r in got_df.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    want_cols = [d[0] for d in res.description]
    want_rows = res.fetchall()

    assert sorted(got_cols) == sorted(want_cols), (
        f"{name}: column mismatch {got_cols} vs {want_cols}"
    )
    assert len(got_rows) == len(want_rows), (
        f"{name}: row count {len(got_rows)} vs {len(want_rows)}"
    )
    g = _canon_rows(got_rows, got_cols)
    w = _canon_rows(want_rows, want_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"got {g[mismatches[0]]} want {w[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_inventory_priority_rows_register_first():
    """The verification driver samples a prefix of the declared inventory;
    the rows that have never been driver-sampled (through r3), plus this
    round's implementation changes, must register first so the sample
    finally covers them. The full inventory is independently swept by
    tools/sweep_correctness.py regardless."""
    from basis_devkit_spark.queries import _SAMPLE_PRIORITY

    names = list(QUERIES)
    assert names[: len(_SAMPLE_PRIORITY)] == [
        n for n in _SAMPLE_PRIORITY if n in set(names)
    ]
    assert set(_SAMPLE_PRIORITY) <= set(names)


def test_pyoracle_xxh64_random_strings(spark):
    """Batch parity of the Python XXH64 model on 300 seeded-random strings
    across lengths 0-100 and scripts (ASCII, latin-1, CJK, emoji) — one
    Spark job, every value bit-exact."""
    import random

    from pyspark.sql import functions as F

    from basis_devkit_spark.queries import pyoracle as po

    rng = random.Random(7)
    alphabets = [
        "abcdefghij0123456789 _-",
        "àéîöü çñß",
        "漢字かなカナ中文字符",
        "🎉🚀😀🌍",
    ]
    strs = list(
        {
            "".join(rng.choice(rng.choice(alphabets)) for _ in range(rng.randrange(0, 101)))
            for _ in range(300)
        }
    )
    got = {
        r.s: r.h
        for r in spark.createDataFrame([(s,) for s in strs], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    bad = [s for s in strs if po.xxh64_str(s) != got[s]]
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]!r}"


def test_pyoracle_minhash_signatures_match_spark(spark, sf_dir):
    """FULL-SIGNATURE parity: the Python MinHash model must reproduce
    ``minhash_signatures`` bit-exactly for every document at the test SF —
    this is the estimator the d02b literal-table oracle is built from, so
    primitive-level xxh64 parity is not enough (the min must also be taken
    in the same signed order Spark's array_min uses)."""
    from basis_devkit_spark.operators.dedup import minhash_signatures
    from basis_devkit_spark.queries import load, pyoracle as po

    docs = load(spark, sf_dir, "documents")
    got = {
        r[0]: list(r[1])
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    }
    model_docs = po._documents(sf_dir)
    assert len(got) > 0
    mismatches = []
    for doc_id, text in model_docs:
        want = po.minhash_signature_model(text)
        if want is None:
            continue
        if got.get(doc_id) != want:
            mismatches.append(doc_id)
    assert not mismatches, (
        f"{len(mismatches)} signature mismatches; first doc "
        f"{mismatches[0]}: model {po.minhash_signature_model(dict(model_docs)[mismatches[0]])[:4]} "
        f"vs spark {got[mismatches[0]][:4]}"
    )


def test_pyoracle_minhash_signed_order_synthetic(spark):
    """Adversarial doc set for the signed/unsigned min distinction: many
    shingles per doc guarantee each component's bucket mixes hashes above
    and below 2^63, so an unsigned-order min would pick a different element
    for essentially every component."""
    import random

    from basis_devkit_spark.operators.dedup import minhash_signatures
    from basis_devkit_spark.queries import pyoracle as po

    rng = random.Random(99)
    words = [f"w{rng.randrange(10**6)}" for _ in range(400)]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(5, 120)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r[0]: list(r[1]) for r in minhash_signatures(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        assert got[i] == po.minhash_signature_model(t), f"doc {i}"
    # sanity: the distinction is actually exercised — at least one component
    # min is negative (signed order) somewhere in the set
    assert any(any(v < 0 for v in sig) for sig in got.values())


def test_pyoracle_ivf_candidates_match_spark(spark, sf_dir):
    """The Python IVF model must reproduce Spark's candidate generation
    exactly: running ivf_topk with k larger than any cell returns EVERY
    candidate pair, which must equal the model's (query, match) set —
    cell assignment and probing agree bit-for-bit (sequential-fold cosine)."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.similarity import ivf_topk
    from basis_devkit_spark.queries import load, pyoracle as po

    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.match_id)
        for r in ivf_topk(
            q, emb, k=10_000_000, nlist=8, nprobe=4, centroids=cents
        ).collect()
    }
    want = set(po.ivf_candidates(sf_dir))
    assert got == want, (
        f"candidate sets differ: spark-only {sorted(got - want)[:5]}, "
        f"model-only {sorted(want - got)[:5]}"
    )


def test_pyoracle_xxh64_matches_spark(spark):
    """The Python XXH64 model behind the literal-table oracles must be
    bit-exact with Spark's xxhash64 for every input kind it models:
    strings (all tail-length branches + the 32-byte stripe loop), longs,
    and the multi-arg seed chain with int and long first args."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.queries import pyoracle as po

    strs = ["", "a", "hello", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
            "abcdefghij" * 5, "the quick brown fox"]
    got = {
        r.s: r.h
        for r in spark.createDataFrame([(s,) for s in strs], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for s in strs:
        assert po.xxh64_str(s) == got[s], s

    longs = [0, 1, -1, 42, 2**62, -(2**62), 123456789123456789]
    rows = (
        spark.createDataFrame([(v,) for v in longs], "v long")
        .select(
            "v",
            F.xxhash64("v").alias("h1"),
            F.xxhash64(F.lit(7), F.col("v")).alias("h2"),
            F.xxhash64(F.col("v"), F.col("v")).alias("h3"),
        )
        .collect()
    )
    for r in rows:
        assert po.to_signed(po.xxh64_long(r.v, 42)) == r.h1
        assert po.to_signed(po.xxh64_long(r.v, po.xxh64_int(7, 42))) == r.h2
        assert (
            po.to_signed(po.xxh64_long(r.v, po.xxh64_long(r.v, 42))) == r.h3
        )
