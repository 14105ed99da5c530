"""Graph versioning on upload (reference cli/services/graph_versions.py:
each upload snapshots a graph version; restore = extract with the pull
command's conflict protection)."""

from __future__ import annotations

import json

import pytest

from basis_devkit_spark.cli import main

YML = """
functions:
  - node_file: n.sql
    id: node0001
    inputs:
      src: t_in
    outputs:
      out: t_out
stores:
  - table: t_in
  - table: t_out
"""


@pytest.fixture()
def app(tmp_path):
    d = tmp_path / "app"
    d.mkdir()
    (d / "graph.yml").write_text(YML)
    (d / "n.sql").write_text("select * from {{ src }}\n")
    return d


def run(capsys, *argv):
    rc = main(list(argv), spark=object())
    out = capsys.readouterr().out
    return rc, json.loads(out) if out.strip().startswith(("{", "[")) else out


def test_upload_snapshots_versions(app, tmp_path, capsys):
    root = str(tmp_path / "root")
    rc, out = run(capsys, "--root", root, "upload", str(app))
    assert rc == 0 and out["graph_version"] == 1

    (app / "n.sql").write_text("select 1 as x\n")
    rc, out = run(capsys, "--root", root, "upload", str(app))
    assert out["graph_version"] == 2

    rc, rows = run(capsys, "--root", root, "list", "versions")
    assert [(r["version"], r["latest"]) for r in rows] == [(1, False), (2, True)]
    assert all(r["files"] == 2 for r in rows)


def test_restore_roundtrip_and_conflict_protection(app, tmp_path, capsys):
    root = str(tmp_path / "root")
    run(capsys, "--root", root, "upload", str(app))       # v1
    (app / "n.sql").write_text("select 2 as y\n")
    run(capsys, "--root", root, "upload", str(app))       # v2

    # clean restore of v1 into an empty dir
    dest = tmp_path / "restored"
    rc, out = run(capsys, "--root", root, "restore", "--version", "1", str(dest))
    assert rc == 0
    assert (dest / "n.sql").read_text() == "select * from {{ src }}\n"

    # restoring v1 over the CHANGED app dir refuses without --force
    rc, out = run(capsys, "--root", root, "restore", "--version", "1", str(app))
    assert rc == 1 and "overwrite" in out
    assert (app / "n.sql").read_text() == "select 2 as y\n"  # untouched

    rc, _ = run(
        capsys, "--root", root, "restore", "--version", "1", str(app), "--force"
    )
    assert rc == 0
    assert (app / "n.sql").read_text() == "select * from {{ src }}\n"

    with pytest.raises(SystemExit, match="no graph version 9"):
        main(["--root", root, "restore", "--version", "9"], spark=object())
    capsys.readouterr()
