"""Tests for the comment-preserving graph.yml editor, zip packaging, and
diff services (reference: configuration/edit.py, services/diffs.py)."""

import io
import zipfile
from pathlib import Path

import pytest
import yaml

from basis_devkit_spark.graph.edit import (
    DiffResult,
    FileOverwriteError,
    GraphConfigEditor,
    GraphDirectoryEditor,
    compress_directory,
    format_diffs,
    get_diffs_between_zip_and_dir,
)

SAMPLE = """\
# my app
title: Demo App  # inline comment
slug: demo-app

functions:
  # ingest section
  - node_file: ingest.py
    id: aaaaaaaa

  - node_file: report.sql
    inputs:
      in: raw
    id: bbbbbbbb

stores:
  - table: raw
    id: cccccccc
"""


@pytest.fixture
def yml(tmp_path) -> Path:
    p = tmp_path / "graph.yml"
    p.write_text(SAMPLE)
    return p


class TestGraphConfigEditor:
    def test_roundtrip_is_byte_identical(self, yml):
        ed = GraphConfigEditor(yml)
        assert ed.dump() == SAMPLE

    def test_add_node_preserves_comments(self, yml):
        ed = GraphConfigEditor(yml)
        ed.add_node("clean.py", id="dddddddd", title="Clean")
        out = ed.dump()
        # Every original line survives untouched.
        for line in SAMPLE.splitlines():
            assert line in out.splitlines()
        assert "# my app" in out and "# ingest section" in out
        parsed = yaml.safe_load(out)
        files = [n.get("node_file") for n in parsed["functions"]]
        assert files == ["ingest.py", "report.sql", "clean.py"]
        new = parsed["functions"][-1]
        assert new == {"node_file": "clean.py", "title": "Clean", "id": "dddddddd"}

    def test_add_node_duplicate_raises(self, yml):
        ed = GraphConfigEditor(yml)
        with pytest.raises(ValueError, match="already defined"):
            ed.add_node("ingest.py")
        with pytest.raises(ValueError, match="already defined"):
            ed.add_node("new.py", id="bbbbbbbb")

    def test_add_table_and_duplicate(self, yml):
        ed = GraphConfigEditor(yml)
        ed.add_table("clean", id="eeeeeeee")
        assert [s["table"] for s in ed.store_nodes()] == ["raw", "clean"]
        with pytest.raises(ValueError, match="already defined"):
            ed.add_table("raw")

    def test_add_webhook_and_component_uses(self, yml):
        ed = GraphConfigEditor(yml)
        ed.add_webhook("hook", id="ffffffff")
        ed.add_component_uses(
            "org/comp@v1", inputs={"in": "raw"}, id="gggggggg"
        )
        nodes = list(ed.function_nodes())
        assert nodes[-2]["webhook"] == "hook"
        assert nodes[-1]["uses"] == "org/comp@v1"
        assert nodes[-1]["inputs"] == {"in": "raw"}

    def test_set_name_replaces_in_place(self, yml):
        ed = GraphConfigEditor(yml)
        ed.set_name("Renamed")
        out = ed.dump()
        assert yaml.safe_load(out)["title"] == "Renamed"
        # Only the title line changed; comments elsewhere intact.
        assert "# ingest section" in out
        assert ed.get_title() == "Renamed"

    def test_missing_block_created(self, tmp_path):
        p = tmp_path / "graph.yml"
        p.write_text("title: Empty\n")
        ed = GraphConfigEditor(p)
        ed.add_node("a.py", id="aaaaaaaa")
        parsed = yaml.safe_load(ed.dump())
        assert parsed["functions"][0]["node_file"] == "a.py"

    def test_read_false_starts_empty(self, tmp_path):
        ed = GraphConfigEditor(tmp_path / "new.yml", read=False)
        ed.set_name("Fresh").add_node("a.py", id="aaaaaaaa")
        ed.write()
        parsed = yaml.safe_load((tmp_path / "new.yml").read_text())
        assert parsed["title"] == "Fresh"

    def test_add_missing_node_ids(self, tmp_path):
        p = tmp_path / "graph.yml"
        p.write_text(
            "functions:\n"
            "  # keep me\n"
            "  - node_file: a.py\n"
            "  - node_file: b.py\n"
            "    id: already1\n"
            "stores:\n"
            "  - table: t\n"
        )
        ed = GraphConfigEditor(p)
        ed.add_missing_node_ids()
        parsed = yaml.safe_load(ed.dump())
        ids = [n.get("id") for n in parsed["functions"]]
        assert all(ids) and ids[1] == "already1"
        assert parsed["stores"][0].get("id")
        assert "# keep me" in ed.dump()

    def test_add_missing_node_ids_flow_style(self, tmp_path):
        p = tmp_path / "graph.yml"
        p.write_text("functions:\n  - {node_file: a.py}\n")
        ed = GraphConfigEditor(p)
        ed.add_missing_node_ids()
        parsed = yaml.safe_load(ed.dump())
        assert parsed["functions"][0]["id"]

    def test_write_back(self, yml):
        ed = GraphConfigEditor(yml)
        ed.add_node("x.py", id="hhhhhhhh")
        ed.write()
        again = GraphConfigEditor(yml)
        assert any(
            n.get("node_file") == "x.py" for n in again.function_nodes()
        )


def _mkgraph(d: Path, extra: dict[str, str] | None = None) -> Path:
    d.mkdir(parents=True, exist_ok=True)
    (d / "graph.yml").write_text(
        "title: App\nfunctions:\n  - node_file: a.py\n    id: aaaaaaaa\n"
    )
    (d / "a.py").write_text("def run(ctx):\n    pass\n")
    for name, content in (extra or {}).items():
        (d / name).write_text(content)
    return d


class TestZipAndDiffs:
    def test_compress_skips_ignored(self, tmp_path):
        d = _mkgraph(tmp_path / "app", {"notes.txt": "hi"})
        (d / "__pycache__").mkdir()
        (d / "__pycache__" / "junk.cpython-311.pyc").write_text("x")
        (d / ".DS_Store").write_text("x")
        buf = compress_directory(d)
        with zipfile.ZipFile(buf) as zf:
            names = set(zf.namelist())
        assert names == {"graph.yml", "a.py", "notes.txt"}

    def test_diff_added_removed_changed(self, tmp_path):
        d = _mkgraph(tmp_path / "app", {"notes.txt": "hi"})
        buf = compress_directory(d)
        # Mutate local copy: change a.py, delete notes.txt, add local.txt.
        (d / "a.py").write_text("def run(ctx):\n    return 1\n")
        (d / "notes.txt").unlink()
        (d / "local.txt").write_text("mine")
        with zipfile.ZipFile(buf) as zf:
            diffs = get_diffs_between_zip_and_dir(zf, d, from_remote=True)
        assert diffs.added == ["notes.txt"]  # in zip, not local
        assert diffs.removed == ["local.txt"]  # local-only
        assert list(diffs.changed) == ["a.py"]
        text = format_diffs(diffs, context=True)
        assert "+    pass" in text or "-    pass" in text

    def test_diff_empty_when_identical(self, tmp_path):
        d = _mkgraph(tmp_path / "app")
        buf = compress_directory(d)
        with zipfile.ZipFile(buf) as zf:
            diffs = get_diffs_between_zip_and_dir(zf, d, from_remote=True)
        assert diffs.is_empty
        assert DiffResult().is_empty

    def test_diff_binary(self, tmp_path):
        d = _mkgraph(tmp_path / "app")
        (d / "blob.bin").write_bytes(b"\xff\xfe\x00A")
        buf = compress_directory(d)
        (d / "blob.bin").write_bytes(b"\xff\xfe\x00B")
        with zipfile.ZipFile(buf) as zf:
            diffs = get_diffs_between_zip_and_dir(zf, d, from_remote=True)
        assert diffs.changed["blob.bin"][-1] == "Binary contents differ"


class TestGraphDirectoryEditor:
    def test_add_node_from_file_registers(self, tmp_path):
        d = _mkgraph(tmp_path / "app")
        ed = GraphDirectoryEditor(d)
        ed.add_node_from_file("b.py", io.BytesIO(b"def run(ctx):\n    pass\n"))
        assert (d / "b.py").read_text().startswith("def run")
        parsed = yaml.safe_load((d / "graph.yml").read_text())
        assert any(n.get("node_file") == "b.py" for n in parsed["functions"])

    def test_overwrite_protection(self, tmp_path):
        d = _mkgraph(tmp_path / "app")
        ed = GraphDirectoryEditor(d)
        with pytest.raises(FileOverwriteError):
            ed.add_node_from_file("a.py", io.BytesIO(b"different"))
        # Identical content is fine (no-op write).
        ed.add_node_from_file(
            "a.py", io.BytesIO((d / "a.py").read_bytes())
        )
        # overwrite=True clobbers.
        GraphDirectoryEditor(d, overwrite=True).add_node_from_file(
            "a.py", io.BytesIO(b"def run(ctx):\n    return 2\n")
        )
        assert "return 2" in (d / "a.py").read_text()

    def test_add_node_from_zip_single_file(self, tmp_path):
        src = _mkgraph(tmp_path / "src", {"extra.sql": "select 1 as x\n"})
        dst = _mkgraph(tmp_path / "dst")
        buf = compress_directory(src)
        GraphDirectoryEditor(dst).add_node_from_zip("extra.sql", "extra.sql", buf)
        assert (dst / "extra.sql").read_text() == "select 1 as x\n"
        parsed = yaml.safe_load((dst / "graph.yml").read_text())
        assert any(
            n.get("node_file") == "extra.sql" for n in parsed["functions"]
        )

    def test_add_subgraph_from_zip(self, tmp_path):
        src = tmp_path / "srcroot"
        sub = _mkgraph(src / "subg", {"s.sql": "select 2 as y\n"})
        buf = compress_directory(src)
        dst = _mkgraph(tmp_path / "dst")
        GraphDirectoryEditor(dst).add_node_from_zip(
            "subg/graph.yml", "mysub/graph.yml", buf
        )
        assert (dst / "mysub" / "graph.yml").exists()
        assert (dst / "mysub" / "s.sql").read_text() == "select 2 as y\n"

    def test_graph_slug(self, tmp_path):
        d = _mkgraph(tmp_path / "My App")
        assert GraphDirectoryEditor(d).graph_slug() == "My-App"

    def test_add_missing_node_ids_recursive(self, tmp_path):
        root = tmp_path / "app"
        _mkgraph(root)
        (root / "graph.yml").write_text("functions:\n  - node_file: a.py\n")
        sub = root / "sub"
        sub.mkdir()
        (sub / "graph.yml").write_text("functions:\n  - node_file: s.py\n")
        GraphDirectoryEditor(root).add_missing_node_ids()
        for p in (root / "graph.yml", sub / "graph.yml"):
            parsed = yaml.safe_load(p.read_text())
            assert parsed["functions"][0].get("id")


class TestCliPull:
    def test_pull_conflict_and_force(self, tmp_path, capsys):
        from basis_devkit_spark.cli import main

        app = _mkgraph(tmp_path / "comp")
        reg = tmp_path / "registry"
        rc = main(
            ["publish", str(app), "org/comp@v1", "--registry", str(reg)],
            spark=object(),
        )
        assert rc == 0
        dest = tmp_path / "work"
        rc = main(
            [
                "pull", "org/comp@v1", str(dest),
                "--registry", str(reg),
            ],
            spark=object(),
        )
        assert rc == 0 and (dest / "a.py").exists()
        # Local edit → conflict → exit 1; --force overwrites.
        (dest / "a.py").write_text("changed\n")
        rc = main(
            ["pull", "org/comp@v1", str(dest), "--registry", str(reg)],
            spark=object(),
        )
        assert rc == 1
        assert "would overwrite" in capsys.readouterr().out
        rc = main(
            [
                "pull", "org/comp@v1", str(dest),
                "--registry", str(reg), "--force",
            ],
            spark=object(),
        )
        assert rc == 0
        assert (dest / "a.py").read_text().startswith("def run")


class TestFlowStyleBlocks:
    def test_append_into_flow_style_empty_list(self, tmp_path):
        p = tmp_path / "graph.yml"
        p.write_text("# top\ntitle: T\nfunctions: []\nstores:\n  - table: t\n")
        ed = GraphConfigEditor(p)
        ed.add_node("a.py", id="aaaaaaaa")
        parsed = yaml.safe_load(ed.dump())
        assert parsed["functions"] == [{"node_file": "a.py", "id": "aaaaaaaa"}]
        assert "# top" in ed.dump()
        assert parsed["stores"] == [{"table": "t"}]

    def test_append_into_flow_style_nonempty_list(self, tmp_path):
        p = tmp_path / "graph.yml"
        p.write_text("functions: [{node_file: x.py, id: xxxxxxxx}]\n")
        ed = GraphConfigEditor(p)
        ed.add_node("y.py", id="yyyyyyyy")
        parsed = yaml.safe_load(ed.dump())
        assert [n["node_file"] for n in parsed["functions"]] == ["x.py", "y.py"]
        # Duplicate detection still sees the flow-style entries.
        with pytest.raises(ValueError, match="already defined"):
            ed.add_node("x.py")


class TestGitAwarePackaging:
    def test_git_directory_respects_gitignore(self, tmp_path):
        import subprocess
        import zipfile as _zf

        d = _mkgraph(tmp_path / "app", {"secret.env": "KEY=1", "keep.txt": "k"})
        (d / ".gitignore").write_text("secret.env\n")
        subprocess.run(
            ["git", "init", "-q", str(d)], check=True,
            env={"HOME": str(tmp_path), "PATH": "/usr/bin:/bin"},
        )
        buf = compress_directory(d)
        with _zf.ZipFile(buf) as zf:
            names = set(zf.namelist())
        assert "secret.env" not in names
        assert {"graph.yml", "a.py", "keep.txt"} <= names
        # The built-in hygiene filter applies on top of git's list, so VCS
        # plumbing like .gitignore stays out of the package either way.
        assert ".gitignore" not in names


def test_add_binary_node_file(tmp_path):
    """Binary content round-trips through the directory editor (bytes
    compare for overwrite protection, no text decode)."""
    d = _mkgraph(tmp_path / "app")
    blob = b"\xff\xfe\x00\x01PNGISH"
    ed = GraphDirectoryEditor(d)
    ed.add_node_from_file("asset.bin", io.BytesIO(blob))
    assert (d / "asset.bin").read_bytes() == blob
    # identical re-add is a no-op; differing content raises
    ed.add_node_from_file("asset.bin", io.BytesIO(blob))
    import pytest as _pytest

    with _pytest.raises(FileOverwriteError):
        ed.add_node_from_file("asset.bin", io.BytesIO(b"\x00different"))
