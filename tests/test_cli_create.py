"""CLI `create` scaffolding tests, mirroring the reference's CliRunner
suite (tests/cli/test_create.py)."""

import yaml

from basis_devkit_spark.cli import main


def _create_app(d):
    assert main(["create", "app", str(d)], spark=object()) == 0
    return d / "graph.yml"


def test_create_app(tmp_path, capsys):
    yml = _create_app(tmp_path / "my app")
    parsed = yaml.safe_load(yml.read_text())
    assert parsed["title"] == "my app"
    assert parsed["slug"] == "my-app"


def test_create_app_refuses_existing(tmp_path):
    _create_app(tmp_path / "g")
    import pytest

    with pytest.raises(SystemExit):
        main(["create", "app", str(tmp_path / "g")], spark=object())


def test_create_python_node(tmp_path):
    d = tmp_path / "g"
    yml = _create_app(d)
    rc = main(["create", "node", str(d / "mynode.py")], spark=object())
    assert rc == 0
    assert "from basis_devkit_spark import" in (d / "mynode.py").read_text()
    parsed = yaml.safe_load(yml.read_text())
    node = parsed["functions"][0]
    assert node["node_file"] == "mynode.py"
    assert node["title"] == "mynode"
    assert node["id"]


def test_create_sql_node_with_title(tmp_path):
    d = tmp_path / "g"
    yml = _create_app(d)
    main(
        ["create", "node", str(d / "agg.sql"), "--title", "Aggregate"],
        spark=object(),
    )
    assert (d / "agg.sql").read_text().startswith("--")
    parsed = yaml.safe_load(yml.read_text())
    assert parsed["functions"][0]["title"] == "Aggregate"


def test_create_subgraph_node(tmp_path):
    d = tmp_path / "g"
    yml = _create_app(d)
    main(["create", "node", str(d / "sub" / "graph.yml")], spark=object())
    assert yaml.safe_load((d / "sub" / "graph.yml").read_text())["title"] == "sub"
    parsed = yaml.safe_load(yml.read_text())
    assert parsed["functions"][0]["node_file"] == "sub/graph.yml"


def test_create_webhook_auto_creates_table(tmp_path):
    d = tmp_path / "g"
    yml = _create_app(d)
    main(
        ["create", "node", "hook", "--type", "webhook", "--app", str(d)],
        spark=object(),
    )
    text = yml.read_text()
    assert "webhook: hook" in text
    assert "table: hook" in text


def test_create_component_node(tmp_path):
    d = tmp_path / "g"
    yml = _create_app(d)
    main(
        ["create", "node", "foo/bar@v1", "--type", "component", "--app", str(d)],
        spark=object(),
    )
    assert "uses: foo/bar@v1" in yml.read_text()


def test_create_table_node(tmp_path):
    d = tmp_path / "g"
    yml = _create_app(d)
    main(
        ["create", "node", "tbl", "--type", "table", "--app", str(d)],
        spark=object(),
    )
    assert "table: tbl" in yml.read_text()


def test_create_node_rejects_unknown_extension(tmp_path):
    d = tmp_path / "g"
    _create_app(d)
    import pytest

    with pytest.raises(SystemExit, match="graph.yml or end in"):
        main(["create", "node", str(d / "bad.txt")], spark=object())


def test_created_app_runs_end_to_end(tmp_path, spark):
    """A scaffolded app with an added SQL node loads and runs."""
    from basis_devkit_spark.engine import Engine

    d = tmp_path / "g"
    _create_app(d)
    main(["create", "node", "src", "--type", "table", "--app", str(d)], spark=object())
    main(["create", "node", "out", "--type", "table", "--app", str(d)], spark=object())
    main(["create", "node", str(d / "q.sql")], spark=object())
    (d / "q.sql").write_text("select x, x * 2 as y from {{ src }}")
    # Wire the node's ports.
    text = (d / "graph.yml").read_text()
    text = text.replace(
        "  - node_file: q.sql\n",
        "  - node_file: q.sql\n    inputs:\n      src: src\n"
        "    outputs:\n      out: out\n",
    )
    (d / "graph.yml").write_text(text)
    eng = Engine(spark, str(tmp_path / "store"))
    eng.load_graph(str(d))
    eng.seed_store("src", spark.createDataFrame([(1,), (2,)], "x int"))
    eng.run_graph()
    assert sorted((r.x, r.y) for r in eng.table_df("out").collect()) == [
        (1, 2),
        (2, 4),
    ]


def test_delete_deregisters_app(tmp_path, capsys):
    import pytest

    d = tmp_path / "g"
    _create_app(d)
    (d / "q.sql").write_text("select 1 as x")
    main(["create", "node", str(d / "q2.sql")], spark=object())
    root = str(tmp_path / "root")
    assert main(["--root", root, "upload", str(d)], spark=object()) == 0
    with pytest.raises(SystemExit, match="--force"):
        main(["--root", root, "delete"], spark=object())
    assert main(["--root", root, "delete", "--force"], spark=object()) == 0
    # Local files untouched (delete.py: 'will not delete any files locally').
    assert (d / "graph.yml").exists()
    with pytest.raises(SystemExit, match="no app registered"):
        main(["--root", root, "delete", "--force"], spark=object())


def test_update_component_deprecation(tmp_path):
    import pytest

    from basis_devkit_spark.graph.components import is_deprecated

    comp = tmp_path / "comp"
    _create_app(comp)
    main(["create", "node", str(comp / "c.sql")], spark=object())
    (comp / "c.sql").write_text("select 1 as x")
    reg = str(tmp_path / "registry")
    assert (
        main(["publish", str(comp), "org/c@v1", "--registry", reg], spark=object())
        == 0
    )
    import os

    os.environ["BASIS_DEVKIT_SPARK_COMPONENTS"] = reg
    try:
        assert not is_deprecated("org/c@v1")
        main(
            ["update", "org/c@v1", "--deprecated", "--registry", reg],
            spark=object(),
        )
        assert is_deprecated("org/c@v1")
        # New apps refuse a deprecated component...
        app = tmp_path / "consumer"
        _create_app(app)
        with pytest.raises(SystemExit, match="deprecated"):
            main(
                ["create", "node", "org/c@v1", "--type", "component",
                 "--app", str(app)],
                spark=object(),
            )
        # ...and the flag can be lifted.
        main(
            ["update", "org/c@v1", "--no-deprecated", "--registry", reg],
            spark=object(),
        )
        assert not is_deprecated("org/c@v1")
        main(
            ["create", "node", "org/c@v1", "--type", "component",
             "--app", str(app)],
            spark=object(),
        )
        assert "uses: org/c@v1" in (app / "graph.yml").read_text()
    finally:
        del os.environ["BASIS_DEVKIT_SPARK_COMPONENTS"]


def test_list_apps_shows_registered_and_components(tmp_path, capsys):
    import json
    import os

    comp = tmp_path / "comp"
    _create_app(comp)
    main(["create", "node", str(comp / "c.sql")], spark=object())
    (comp / "c.sql").write_text("select 1 as x")
    reg = str(tmp_path / "registry")
    os.environ["BASIS_DEVKIT_SPARK_COMPONENTS"] = reg
    try:
        main(["publish", str(comp), "org/c@v1", "--registry", reg], spark=object())
        root = str(tmp_path / "root")
        main(["--root", root, "upload", str(comp)], spark=object())
        capsys.readouterr()
        rc = main(["--root", root, "list", "apps"], spark=object())
        assert rc == 0
        rows = json.loads(capsys.readouterr().out)
        kinds = {r["kind"] for r in rows}
        assert kinds == {"app", "component"}
        assert any(r.get("key") == "org/c@v1" and r["deprecated"] is False
                   for r in rows)
    finally:
        del os.environ["BASIS_DEVKIT_SPARK_COMPONENTS"]
