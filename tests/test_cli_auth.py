"""CLI auth/profile/secrets surface (reference: cli/commands/login.py,
logout.py, config.py; cli/services/auth.py, secrets.py, organizations.py,
pagination.py — re-expressed as a local profile + 0600 JSON stores)."""

from __future__ import annotations

import json

import pytest

from basis_devkit_spark.cli import main


@pytest.fixture()
def home(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("BASIS_DEVKIT_SPARK_HOME", str(tmp_path / "home"))
    monkeypatch.delenv("BASIS_DEVKIT_SPARK_CONFIG", raising=False)
    return tmp_path / "home"


def run(capsys, *argv):
    rc = main(list(argv), spark=object())  # no command here touches Spark
    out = capsys.readouterr().out
    return rc, json.loads(out) if out.strip() else None


def test_login_whoami_logout_cycle(home, capsys):
    rc, out = run(capsys, "login", "--user", "ada", "-o", "acme")
    assert rc == 0 and out["logged_in"] and out["organization"] == "acme"

    rc, who = run(capsys, "whoami")
    assert who == {
        "username": "ada",
        "email": "ada@localhost",
        "organization": "acme",
        "default_organization": "acme",
    }

    cfg = json.loads((home / "config.json").read_text())
    assert cfg["token"] and cfg["username"] == "ada"
    # 0600: the file holds the token
    assert (home / "config.json").stat().st_mode & 0o777 == 0o600

    rc, _ = run(capsys, "logout")
    with pytest.raises(SystemExit):
        main(["whoami"], spark=object())
    capsys.readouterr()


def test_config_sets_default_org(home, capsys):
    rc, out = run(capsys, "config", "-o", "acme")
    assert rc == 0 and out["organization"] == "acme"
    rc, out = run(capsys, "config")
    assert out["organization"] == "acme" and not out["logged_in"]


def test_secret_crud_masking_and_pagination(home, capsys):
    run(capsys, "login", "--user", "ada", "-o", "acme")
    run(capsys, "secret", "create", "db_password", "hunter2", "--sensitive")
    run(capsys, "secret", "create", "api_host", "example.test",
        "--description", "service host")

    rc, rows = run(capsys, "secret", "list")
    assert [r["name"] for r in rows] == ["api_host", "db_password"]
    by_name = {r["name"]: r for r in rows}
    assert by_name["db_password"]["value"] != "hunter2"  # masked
    assert by_name["api_host"]["value"] == "example.test"
    assert by_name["api_host"]["description"] == "service host"

    rc, page = run(capsys, "secret", "list", "--limit", "1", "--offset", "1")
    assert [r["name"] for r in page] == ["db_password"]

    sp = home / "secrets" / "acme.json"
    assert sp.stat().st_mode & 0o777 == 0o600

    rc, _ = run(capsys, "secret", "delete", "db_password")
    rc, rows = run(capsys, "secret", "list")
    assert [r["name"] for r in rows] == ["api_host"]

    with pytest.raises(SystemExit):
        main(["secret", "delete", "nope"], spark=object())
    capsys.readouterr()


def test_secret_org_isolation_and_list_orgs(home, capsys):
    run(capsys, "login", "--user", "ada", "-o", "acme")
    run(capsys, "secret", "create", "k", "v1")
    run(capsys, "secret", "create", "k", "v2", "-o", "other")

    from basis_devkit_spark.secrets import resolve_secret

    assert resolve_secret("k", organization="acme") == "v1"
    assert resolve_secret("k", organization="other") == "v2"

    rc, orgs = run(capsys, "list", "orgs")
    names = {r["organization"]: r["default"] for r in orgs}
    assert names.get("acme") is True and names.get("other") is False


def test_secret_ref_resolves_in_parameter(home, capsys):
    run(capsys, "login", "--user", "ada", "-o", "acme")
    run(capsys, "secret", "create", "batch_size", "42")

    from basis_devkit_spark.node.params import Parameter

    p = Parameter(name="batch_size", type="int")
    p.bind("secret://batch_size")
    assert p.value == 42


def test_typed_secret_resolves_in_sql_node(home, capsys, spark, tmp_path):
    """An int-typed secret renders as an int SQL literal through the SQL
    template path (works in LIMIT), mirroring server-side secret injection."""
    import textwrap

    from basis_devkit_spark.engine import Engine

    run(capsys, "login", "--user", "ada", "-o", "acme")
    run(capsys, "secret", "create", "top_n", "3", "--type", "int")

    app = tmp_path / "app"
    app.mkdir()
    (app / "graph.yml").write_text(
        textwrap.dedent(
            """
            functions:
              - node_file: take.sql
                id: takenode1
                inputs:
                  src: numbers
                outputs:
                  out: top
                parameters:
                  top_n: secret://top_n
            stores:
              - table: numbers
              - table: top
            """
        )
    )
    (app / "take.sql").write_text(
        "select n from {{ src }} order by n desc limit {{ top_n }}"
    )
    eng = Engine(spark, str(tmp_path / "store"))
    eng.load_graph(str(app))
    eng.seed_store("numbers", spark.createDataFrame([(i,) for i in range(10)], "n int"))
    eng.run_graph()
    assert {r.n for r in eng.table_df("top").collect()} == {7, 8, 9}


def test_secret_requires_org_context(home, capsys):
    with pytest.raises(SystemExit, match="organization"):
        main(["secret", "create", "k", "v"], spark=object())
    capsys.readouterr()


def test_org_resolution_order(home, capsys):
    """Mirror of the reference's IdLookup.organization_uid resolution
    (lookup.py:73-100): explicit flag > configured default > sole known
    org (adopted AND persisted); several knowns without a default is an
    actionable error, not a guess."""
    from basis_devkit_spark.cli_config import (
        read_devkit_config,
        resolve_organization,
        update_devkit_config,
    )

    # no orgs known at all → error pointing at login
    with pytest.raises(ValueError, match="login"):
        resolve_organization(None)
    # explicit always wins, even with a configured default
    update_devkit_config(organization_id="acme")
    assert resolve_organization("other") == "other"
    assert resolve_organization(None) == "acme"
    # sole known org (via its secrets store) is adopted AND persisted
    update_devkit_config(organization_id=None)
    rc, _ = run(capsys, "secret", "create", "k", "v", "-o", "soloorg")
    assert rc == 0
    assert resolve_organization(None) == "soloorg"
    assert read_devkit_config().organization_id == "soloorg"
    # several known orgs, no default → must choose
    update_devkit_config(organization_id=None)
    rc, _ = run(capsys, "secret", "create", "k2", "v2", "-o", "otherorg")
    assert rc == 0
    update_devkit_config(organization_id=None)
    with pytest.raises(ValueError, match="soloorg.*otherorg|otherorg.*soloorg"):
        resolve_organization(None)


def test_whoami_org_override(home, capsys):
    run(capsys, "login", "--user", "bo", "-o", "acme")
    rc, who = run(capsys, "whoami", "-o", "umbrella")
    assert rc == 0
    assert who["organization"] == "umbrella"
    assert who["default_organization"] == "acme"
