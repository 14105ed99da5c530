"""HTTP webhook endpoint + CLI surface (VERDICT r01 missing items 1-2).

The webhook endpoint mirrors the reference's auto-created-table ingest
(`create.py:177-197`) and request/response keys (`node.py:544-553`); the
CLI mirrors the reference's upload/trigger/list/download command set,
tested in-process like the reference's CliRunner suites.
"""

import json
import textwrap
import urllib.request

import pytest

from basis_devkit_spark.engine import Engine
from basis_devkit_spark.engine.webhook_http import WebhookServer


def write_app(tmp_path, yml, **files):
    tmp_path.mkdir(parents=True, exist_ok=True)
    (tmp_path / "graph.yml").write_text(textwrap.dedent(yml))
    for name, content in files.items():
        p = tmp_path / name.replace("__", "/")
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(content))
    return str(tmp_path)


def _post(url, obj, timeout=60):
    req = urllib.request.Request(
        url,
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null")


@pytest.fixture()
def hook_app(spark, tmp_path):
    app = write_app(
        tmp_path / "app",
        """
        functions:
          - webhook: hook
          - node_file: agg.sql
            id: tally
            inputs:
              hook: hook
            outputs:
              out: totals
        stores:
          - table: totals
        """,
        **{"agg.sql": "select kind, count(*) as n from {{ hook }} group by kind"},
    )
    eng = Engine(spark, str(tmp_path / "store"))
    eng.load_graph(app)
    server = WebhookServer(eng).start()
    yield eng, server
    server.stop()


def test_http_post_lands_and_propagates(hook_app):
    eng, server = hook_app
    status, body = _post(
        f"{server.url}/webhooks/hook", [{"kind": "a"}, {"kind": "b"}, {"kind": "a"}]
    )
    assert status == 202 and body["records"] == 3
    got = {r.kind: r.n for r in eng.table_df("totals").collect()}
    assert got == {"a": 2, "b": 1}


def test_http_bearer_auth(spark, tmp_path):
    """With auth_token set, requests without the exact bearer header get
    401 and nothing is ingested; the correct header works as usual."""
    app = write_app(
        tmp_path / "app",
        """
        functions:
          - webhook: hook
        stores: []
        """,
    )
    eng = Engine(spark, str(tmp_path / "store"))
    eng.load_graph(app)
    server = WebhookServer(eng, auth_token="s3cret").start()
    try:
        status, body = _post(f"{server.url}/webhooks/hook", {"kind": "a"})
        assert status == 401

        req = urllib.request.Request(
            f"{server.url}/webhooks/hook",
            data=json.dumps({"kind": "a"}).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": "Bearer wrong",
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                status = r.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 401

        req = urllib.request.Request(
            f"{server.url}/webhooks/hook",
            data=json.dumps({"kind": "a"}).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": "Bearer s3cret",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 202
    finally:
        server.stop()


def test_http_unknown_webhook_and_bad_json(hook_app):
    _, server = hook_app
    status, _ = _post(f"{server.url}/webhooks/nope", {"x": 1})
    assert status == 404
    req = urllib.request.Request(
        f"{server.url}/webhooks/hook", data=b"not json", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_http_list_webhooks(hook_app):
    _, server = hook_app
    with urllib.request.urlopen(f"{server.url}/webhooks", timeout=30) as r:
        hooks = json.loads(r.read())
    assert hooks == [{"name": "hook", "url": "/webhooks/hook"}]


def test_http_request_response_roundtrip(spark, tmp_path):
    """?wait=1 adds patterns_request_key to the ingested row; a downstream
    node answers via respond_to_request and the payload becomes the HTTP
    response body (node.py:544-553)."""
    app = write_app(
        tmp_path / "app",
        """
        functions:
          - webhook: ask
          - node_file: answer.py
            id: answerer
            inputs:
              src: ask
        stores: []
        """,
        **{
            "answer.py": """
            from basis_devkit_spark import *

            @node
            def answer(src=InputTable):
                rows = src.read_dataframe().collect()
                for r in rows:
                    d = r.asDict()
                    key = d.get("patterns_request_key")
                    if key:
                        respond_to_request(key, {"echo": d["q"], "answered": True})
            """,
        },
    )
    eng = Engine(spark, str(tmp_path / "store"))
    eng.load_graph(app)
    server = WebhookServer(eng).start()
    try:
        status, body = _post(f"{server.url}/webhooks/ask?wait=1", {"q": "ping"})
        assert status == 200
        assert body == {"echo": "ping", "answered": True}
    finally:
        server.stop()


# ----------------------------- CLI -------------------------------------


def _sql_app(tmp_path):
    return write_app(
        tmp_path / "app",
        """
        functions:
          - node_file: gen.py
            id: gen
            outputs:
              dst: nums
          - node_file: double.sql
            id: doubler
            inputs:
              nums: nums
            outputs:
              out: doubled
        stores:
          - table: nums
          - table: doubled
        """,
        **{
            "gen.py": """
            from basis_devkit_spark import *

            @node
            def gen(dst=OutputTable):
                dst.replace([{"x": 1}, {"x": 2}, {"x": 3}])
            """,
            "double.sql": "select x * 2 as y from {{ nums }}",
        },
    )


def test_cli_upload_run_list_download(spark, tmp_path, capsys):
    from basis_devkit_spark.cli import main

    app = _sql_app(tmp_path)
    root = str(tmp_path / "store")

    assert main(["--root", root, "upload", app], spark=spark) == 0
    up = json.loads(capsys.readouterr().out)
    assert up["nodes"] == ["gen", "doubler"]
    assert sorted(up["stores"]) == ["doubled", "nums"]

    # app registered with the root: commands no longer need the path
    assert main(["--root", root, "run"], spark=spark) == 0
    capsys.readouterr()
    assert main(["--root", root, "list", "stores"], spark=spark) == 0
    stores = {s["table"]: s for s in json.loads(capsys.readouterr().out)}
    assert stores["doubled"]["exists"] and stores["doubled"]["records"] == 3

    out = str(tmp_path / "exp.parquet")
    assert (
        main(["--root", root, "download", "--table", "doubled", "--out", out], spark=spark)
        == 0
    )
    capsys.readouterr()
    assert sorted(r.y for r in spark.read.parquet(out).collect()) == [2, 4, 6]


def test_cli_trigger_single_node(spark, tmp_path, capsys):
    from basis_devkit_spark.cli import main

    app = _sql_app(tmp_path)
    root = str(tmp_path / "store")
    main(["--root", root, "upload", app], spark=spark)
    capsys.readouterr()
    assert main(["--root", root, "trigger", "--node", "gen"], spark=spark) == 0
    capsys.readouterr()
    main(["--root", root, "list", "stores"], spark=spark)
    stores = {s["table"]: s for s in json.loads(capsys.readouterr().out)}
    assert stores["nums"]["records"] == 3
    # trigger propagates downstream: doubled was produced by the signal
    assert stores["doubled"]["exists"]

    with pytest.raises(SystemExit):
        main(["--root", root, "trigger", "--node", "ghost"], spark=spark)


def test_cli_config_and_unknown_app(spark, tmp_path, capsys):
    from basis_devkit_spark.cli import main

    root = str(tmp_path / "fresh")
    assert main(["--root", root, "config"], spark=spark) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["app"] is None
    with pytest.raises(SystemExit):
        main(["--root", root, "run"], spark=spark)


def test_cli_publish_and_use_component(spark, tmp_path, capsys, monkeypatch):
    from basis_devkit_spark.cli import main

    comp = tmp_path / "comp"
    write_app(
        comp,
        """
        exposes:
          inputs: [src_t]
          outputs: [dst_t]
        functions:
          - node_file: double.sql
            id: dbl
            inputs:
              nums_port: src_t
            outputs:
              out: dst_t
        """,
        **{"double.sql": "select x * 2 as y from {{ nums_port }}"},
    )
    registry = str(tmp_path / "registry")
    monkeypatch.setenv("BASIS_DEVKIT_SPARK_COMPONENTS", registry)
    assert (
        main(["publish", str(comp), "acme/doubler@v1", "--registry", registry], spark=spark)
        == 0
    )
    out = json.loads(capsys.readouterr().out)
    assert out["published"] == "acme/doubler@v1"

    app = tmp_path / "app"
    write_app(
        app,
        """
        functions:
          - node_file: gen.py
            id: gen
            outputs:
              dst: nums
          - uses: acme/doubler@v1
            id: dblnode
            inputs:
              src_t: nums
            outputs:
              dst_t: doubled
        stores:
          - table: nums
          - table: doubled
        """,
        **{
            "gen.py": """
            from basis_devkit_spark import *

            @node
            def gen(dst=OutputTable):
                dst.replace([{"x": 10}, {"x": 20}])
            """,
        },
    )
    root = str(tmp_path / "store")
    main(["--root", root, "upload", str(app)], spark=spark)
    capsys.readouterr()
    assert main(["--root", root, "run"], spark=spark) == 0
    capsys.readouterr()
    main(["--root", root, "list", "stores"], spark=spark)
    stores = {s["table"]: s for s in json.loads(capsys.readouterr().out)}
    assert stores["doubled"]["records"] == 2


def test_cli_schedule_runs_due_nodes(spark, tmp_path):
    """`schedule --ticks 1` evaluates cron triggers once and runs due
    nodes (every-minute trigger is always due)."""
    import textwrap

    from basis_devkit_spark.cli import main

    app = tmp_path / "app"
    app.mkdir()
    (app / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - node_file: gen.sql
                id: gennode
                trigger: "* * * * *"
                inputs:
                  src: src
                outputs:
                  out: out_t
            stores:
              - table: src
              - table: out_t
            """
        )
    )
    (app / "gen.sql").write_text("select x * 10 as y from {{ src }}")
    root = str(tmp_path / "store")
    from basis_devkit_spark.engine import Engine

    eng = Engine(spark, root)
    eng.load_graph(str(app))
    eng.seed_store("src", spark.createDataFrame([(1,), (2,)], "x int"))
    rc = main(
        ["--root", root, "schedule", str(app), "--ticks", "1", "--poll", "0.01"],
        spark=spark,
    )
    assert rc == 0
    assert sorted(r.y for r in eng.table_df("out_t").collect()) == [10, 20]


def test_cli_vacuum_prunes_versions(spark, tmp_path):
    import textwrap

    from basis_devkit_spark.cli import main

    app = tmp_path / "app"
    app.mkdir()
    (app / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - node_file: q.sql
                id: qnode
                inputs:
                  src: src
                outputs:
                  out: out_t
            stores:
              - table: src
              - table: out_t
            """
        )
    )
    (app / "q.sql").write_text("select x from {{ src }}")
    root = str(tmp_path / "store")
    from basis_devkit_spark.engine import Engine

    eng = Engine(spark, root)
    eng.load_graph(str(app))
    eng.seed_store("src", spark.createDataFrame([(1,)], "x int"))
    for _ in range(4):
        eng.run_graph()
    st = eng.store("out_t")
    assert len(st._manifest.versions) >= 4
    rc = main(["--root", root, "vacuum", str(app), "--keep", "1"], spark=spark)
    assert rc == 0
    st2 = eng.store("out_t")
    st2._manifest = st2._load_manifest()
    assert len(st2._manifest.versions) <= 2  # active + kept
    assert [r.x for r in st2.read().collect()] == [1]


def test_http_post_array_of_non_objects_is_400(hook_app):
    eng, server = hook_app
    status, body = _post(f"{server.url}/webhooks/hook?wait=1", [1, 2, 3])
    assert status == 400
    assert "objects" in body["error"]


def test_cli_explain_node(spark, tmp_path, capsys):
    """explain renders the SQL (params substituted) and returns a plan
    containing the scan + agg shape; python nodes report no static plan."""
    app = write_app(
        tmp_path / "app",
        """
        functions:
          - node_file: agg.sql
            id: aggnode1
            inputs:
              src: numbers
            outputs:
              out: out_t
            parameters:
              cutoff: 5
          - node_file: py.py
            id: pynode01
        stores:
          - table: numbers
          - table: out_t
        """,
        **{
            "agg.sql": "select count(*) as n from {{ src }} where v > {{ cutoff }}",
            "py.py": "pass\n",
        },
    )
    from basis_devkit_spark.cli import main

    root = str(tmp_path / "store")
    eng = Engine(spark, root)
    eng.load_graph(app)
    eng.seed_store("numbers", spark.createDataFrame([(i,) for i in range(10)], "v int"))

    rc = main(["--root", root, "explain", "--node", "aggnode1", app], spark=spark)
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert "where v > 5" in out["sql"]
    assert "HashAggregate" in out["plan"] and "Scan" in out["plan"]

    rc = main(["--root", root, "explain", "--node", "pynode01", app], spark=spark)
    out = json.loads(capsys.readouterr().out)
    assert out["note"].startswith("no static plan")


def test_http_idempotency_key(hook_app):
    """A retried POST with the same Idempotency-Key acks as a duplicate
    and does NOT re-ingest; a different key ingests normally."""
    eng, server = hook_app

    def post_with_key(key):
        req = urllib.request.Request(
            f"{server.url}/webhooks/hook",
            data=json.dumps([{"kind": "a"}]).encode(),
            headers={
                "Content-Type": "application/json",
                "Idempotency-Key": key,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())

    status, body = post_with_key("evt-1")
    assert status == 202 and body["records"] == 1
    status, body = post_with_key("evt-1")        # client retry
    assert status == 200 and body["duplicate"] is True
    status, body = post_with_key("evt-2")        # new delivery
    assert status == 202
    assert eng.table_df("totals").collect()[0].n == 2  # not 3


def test_cli_list_history(spark, tmp_path, capsys):
    from basis_devkit_spark.cli import main
    from basis_devkit_spark.storage.store import TableStore

    root = str(tmp_path)
    st = TableStore(root, "t", spark)
    st.write_replace(spark.range(3).toDF("x"))
    st.append(spark.range(2).toDF("x"))

    assert main(["--root", root, "list", "history", "--table", "t"], spark=spark) == 0
    rows = json.loads(capsys.readouterr().out)
    assert [r["version"] for r in rows] == [2, 1]
    assert rows[0]["active"] and rows[0]["record_count"] == 5

    with pytest.raises(SystemExit):
        main(["--root", root, "list", "history", "--table", "missing"], spark=spark)


def test_cli_restore_table(spark, tmp_path, capsys):
    from basis_devkit_spark.cli import main
    from basis_devkit_spark.storage.store import TableStore

    root = str(tmp_path)
    st = TableStore(root, "t", spark)
    st.write_replace(spark.range(3).toDF("x"))
    v1 = st.get_active_version()
    st.write_replace(spark.range(9).toDF("x"))

    assert main(["--root", root, "restore", "--table", "t", "--version", str(v1)],
                spark=spark) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["restored_from"] == v1 and out["records"] == 3
    st.refresh()
    assert st.read().count() == 3
