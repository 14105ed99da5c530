"""Minimum slice (SURVEY §7.1): graph.yml → SQL node → versioned commit,
hash-matched against DuckDB. Plus the python-node path."""

import os

import duckdb
import pytest

from basis_devkit_spark.engine import Engine

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture()
def engine(spark, tmp_storage, sf_dir):
    eng = Engine(spark, tmp_storage)
    return eng


def test_sql_node_end_to_end(engine, spark, sf_dir):
    engine.load_graph(os.path.join(FIXTURES, "sql_app"))
    engine.seed_store("lineitem", spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    engine.run_graph()

    got = engine.table_df("revenue").orderBy("l_returnflag", "l_linestatus").toPandas()

    con = duckdb.connect()
    con.execute(
        f"create view lineitem as select * from read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = con.execute(
        """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               sum(l_extendedprice) as sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
               avg(l_quantity) as avg_qty,
               count(*) as count_order
        from lineitem
        where l_shipdate <= '1998-09-02'
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """
    ).df()
    assert len(got) == len(want) > 0
    for col in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        assert got[col].round(4).tolist() == want[col].round(4).tolist()
    assert got["count_order"].tolist() == want["count_order"].tolist()


def test_python_node_end_to_end(engine, spark, sf_dir):
    engine.load_graph(os.path.join(FIXTURES, "py_app"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    engine.seed_store("orders", orders)
    engine.run_graph()

    got_n = engine.table_df("big_orders").count()
    want_n = orders.filter("o_totalprice >= 100.0").count()
    assert got_n == want_n > 0
    # state persisted
    st = engine.state_store.load("pynode01")
    assert st["last_min_total"] == 100.0


def test_versioning_replace_keeps_old_data(engine, spark, sf_dir):
    engine.load_graph(os.path.join(FIXTURES, "py_app"))
    store = engine.store("orders")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v1 = store.write_replace(orders.limit(10))
    v2 = store.write_replace(orders.limit(5))
    assert store.get_active_version() == v2
    assert store.read().count() == 5
    # old version data still on disk (retention GC later)
    assert os.path.isdir(store.version_path(v1))
    store.set_active_version(v1)
    assert store.read().count() == 10
