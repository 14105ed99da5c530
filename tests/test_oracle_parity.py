"""Differential harness mimicking the driver's correctness gate: run every
declared query through Spark AND its DuckDB oracle at the test SF, compare
row count, schema (column names), and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

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
