"""Portable export/import (storage/interop.py): the way in and out of the
proprietary manifest format. Exported data must be readable by OTHER
engines (checked with DuckDB) and re-importable with config + history."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from basis_devkit_spark.storage.interop import export_table, import_table
from basis_devkit_spark.storage.store import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(str(tmp_path / "root"), "t", spark)


def test_export_is_plain_parquet_readable_by_duckdb(store, spark, tmp_path):
    store.configure(unique_on=["k"], stats_columns=["k"])
    store.write_replace(spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"))
    dest = str(tmp_path / "out")
    desc = export_table(store, dest)
    assert desc["record_count"] == 2
    con = duckdb.connect()
    rows = con.execute(
        f"select k, s from read_parquet('{dest}/data/*.parquet') order by k"
    ).fetchall()
    assert rows == [(1, "a"), (2, "b")]
    with open(os.path.join(dest, "table.json")) as f:
        d = json.load(f)
    assert d["config"]["unique_on"] == ["k"]


def test_roundtrip_with_history(store, spark, tmp_path):
    store.write_replace(spark.createDataFrame([(1,)], "k int"))
    store.append(spark.createDataFrame([(2,)], "k int"))
    store.append(spark.createDataFrame([(3,)], "k int"))
    dest = str(tmp_path / "out")
    desc = export_table(store, dest, include_history=True)
    assert [v["version"] for v in desc["versions"]] == [1, 2, 3]
    assert desc["versions"][-1]["active"]

    dst = TableStore(str(tmp_path / "root2"), "t2", spark)
    res = import_table(dst, dest, restore_history=True)
    assert res["versions_imported"] == 3
    assert {r.k for r in dst.read().collect()} == {1, 2, 3}
    # time travel preserved: first replayed version has only the first row
    assert {r.k for r in dst.read_version(1).collect()} == {1}


def test_import_restores_config_without_history(store, spark, tmp_path):
    store.configure(unique_on=["k"], partition_by=["p"])
    store.write_replace(
        spark.createDataFrame([(1, "x"), (2, "y")], "k int, p string")
    )
    dest = str(tmp_path / "out")
    export_table(store, dest)

    dst = TableStore(str(tmp_path / "root2"), "t2", spark)
    res = import_table(dst, dest)
    assert res["records"] == 2
    assert dst.unique_on == ["k"]
    # upsert now works on the restored key config
    dst.upsert(spark.createDataFrame([(2, "z")], "k int, p string"))
    got = {r.k: r.p for r in dst.read().collect()}
    assert got == {1: "x", 2: "z"}


def test_import_raw_csv_and_parquet(store, spark, tmp_path):
    csv = tmp_path / "raw.csv"
    csv.write_text("k,s\n1,a\n2,b\n")
    res = import_table(store, str(csv))
    assert res["records"] == 2 and res["versions_imported"] == 1
    assert {r.k for r in store.read().collect()} == {1, 2}

    pq = str(tmp_path / "raw_pq")
    spark.createDataFrame([(9,)], "k int").write.parquet(pq)
    st2 = TableStore(str(tmp_path / "root3"), "t3", spark)
    import_table(st2, pq)
    assert [r.k for r in st2.read().collect()] == [9]


def test_cli_export_import(spark, tmp_path, capsys):
    from basis_devkit_spark.cli import main

    root = str(tmp_path / "root")
    TableStore(root, "events", spark).write_replace(
        spark.createDataFrame([(1,), (2,)], "k int")
    )
    dest = str(tmp_path / "exp")
    rc = main(
        ["--root", root, "export", "--table", "events", "--out", dest],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["records"] == 2

    root2 = str(tmp_path / "root2")
    rc = main(
        ["--root", root2, "import", "--table", "copy", "--src", dest],
        spark=spark,
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["records"] == 2
    assert {r.k for r in TableStore(root2, "copy", spark).read().collect()} == {1, 2}
