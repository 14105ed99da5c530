"""Comment-preserving graph.yml editing, graph zip, and diff services.

Mirrors the reference client's configuration tooling:
- ``GraphConfigEditor`` — edit a graph.yml while preserving comments,
  blank lines, and indentation (`/root/reference/patterns/cli/configuration/
  edit.py:19-232`). The reference uses ruyaml's round-trip mode; that
  library is not available here, so edits are performed as raw-line text
  surgery instead: untouched regions of the file stay byte-identical,
  which is a strictly stronger preservation guarantee than ruyaml's.
- ``GraphDirectoryEditor`` — zip/unzip a graph directory, add nodes from
  files or other zips with overwrite protection (`edit.py:235-369`).
- ``get_diffs_between_zip_and_dir`` / ``DiffResult`` — file-level conflict
  detection between a packaged graph and a working directory
  (`/root/reference/patterns/cli/services/diffs.py:13-70`), used by the
  CLI's pull workflow exactly like the reference's download/upload
  commands (`cli/commands/download.py:58-73`, `upload.py:43-61`).
- ``compress_directory`` / ``directory_contents_to_upload`` — packaging
  helpers with ignore rules (`/root/reference/patterns/cli/helpers.py:
  84-126`).
"""

from __future__ import annotations

import difflib
import io
import os
import re
import subprocess
import zipfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import IO, Any, Iterator, Union

import yaml

from basis_devkit_spark.graph.loader import random_node_id

MISSING = object()

# helpers.py:84-88 — directories/files never packaged.
_IGNORE_DIRS = {".git", ".venv", "venv", "__pycache__", ".mypy_cache", ".idea"}
_IGNORE_RE = re.compile(r"\.DS_Store|.*\.pyc|\.gitignore")


class FileOverwriteError(Exception):
    """Raised when an extract would clobber differing local content
    (edit.py:372-375)."""

    def __init__(self, file_path: Path, message: str) -> None:
        super().__init__(message)
        self.file_path = file_path


# ---------------------------------------------------------------------------
# graph.yml editor
# ---------------------------------------------------------------------------


class GraphConfigEditor:
    """Edit a graph.yml file, preserving comments (edit.py:19-232).

    All mutations are line-level insertions/replacements on the raw text,
    so every untouched line — comments, blank lines, odd indentation —
    survives a read→edit→write round trip byte-identically.
    """

    def __init__(self, path_to_graph_yml: Path | str | None, read: bool = True):
        self._path = Path(path_to_graph_yml) if path_to_graph_yml else None
        if read:
            text = self._path.read_text()
        else:
            text = ""
        self._lines: list[str] = text.splitlines()
        self._trailing_newline = text.endswith("\n") or not text
        # Match the file's list-item indent (edit.py:44-50).
        matches = [len(m.group(1)) for m in re.finditer(r"^( *)-", text, re.MULTILINE)]
        self._item_indent = min(matches, default=2)

    # -- output ------------------------------------------------------------

    def dump(self) -> str:
        """Return the edited config as a yaml string (edit.py:63-67)."""
        out = "\n".join(self._lines)
        if self._trailing_newline and out:
            out += "\n"
        return out

    def write(self) -> None:
        """Write the config back to the file (edit.py:59-61)."""
        self._path.write_text(self.dump())

    def parsed(self) -> dict:
        """The current (edited) config parsed as plain data."""
        return yaml.safe_load(self.dump()) or {}

    # -- scalar keys -------------------------------------------------------

    def get_title(self) -> str | None:
        return self.parsed().get("title")

    def get_slug(self) -> str | None:
        return self.parsed().get("slug")

    def set_name(self, name: str) -> "GraphConfigEditor":
        return self._set_top_level("title", name)

    def set_slug(self, slug: str) -> "GraphConfigEditor":
        return self._set_top_level("slug", slug)

    def _set_top_level(self, key: str, value: str) -> "GraphConfigEditor":
        rendered = yaml.safe_dump({key: value}, default_flow_style=False).strip()
        pat = re.compile(rf"^{re.escape(key)}\s*:")
        for i, line in enumerate(self._lines):
            if pat.match(line):
                self._lines[i] = rendered
                return self
        self._lines.append(rendered)
        return self

    # -- node iteration (edit.py:209-232) ----------------------------------

    def function_nodes(self) -> Iterator[dict]:
        nodes = self.parsed().get("functions")
        if isinstance(nodes, list):
            for node in nodes:
                if isinstance(node, dict):
                    yield node

    def store_nodes(self) -> Iterator[dict]:
        nodes = self.parsed().get("stores")
        if isinstance(nodes, list):
            for node in nodes:
                if isinstance(node, dict):
                    yield node

    def all_nodes(self) -> Iterator[dict]:
        yield from self.function_nodes()
        yield from self.store_nodes()

    # -- adding entries ----------------------------------------------------

    def add_function_node_dict(self, node: dict) -> "GraphConfigEditor":
        """Append a node under ``functions:`` with duplicate detection
        (edit.py:84-99)."""
        d = {k: v for (k, v) in node.items() if v is not None}
        for k in ("node_file", "id", "webhook"):
            if d.get(k) and any(it.get(k) == d[k] for it in self.function_nodes()):
                raise ValueError(
                    f"{k} '{d[k]}' already defined in the graph configuration"
                )
        self._append_list_item("functions", d)
        return self

    def add_node(
        self,
        node_file: str,
        trigger: str | None = None,
        inputs: dict[str, str] | None = None,
        outputs: dict[str, str] | None = None,
        parameters: dict[str, Any] | None = None,
        title: str | None = None,
        id: Any = MISSING,
        description_file: str | None = None,
    ) -> "GraphConfigEditor":
        """edit.py:101-126."""
        if id is MISSING:
            id = random_node_id()
        return self.add_function_node_dict(
            {
                "node_file": node_file,
                "trigger": trigger,
                "inputs": inputs,
                "outputs": outputs,
                "parameters": parameters,
                "title": title,
                "id": str(id) if id else id,
                "description_file": description_file,
            }
        )

    def add_webhook(
        self,
        webhook: str,
        title: str | None = None,
        id: Any = MISSING,
        description_file: str | None = None,
    ) -> "GraphConfigEditor":
        """edit.py:156-173."""
        if id is MISSING:
            id = random_node_id()
        return self.add_function_node_dict(
            {
                "webhook": webhook,
                "title": title or None,
                "id": str(id) if id else id,
                "description_file": description_file,
            }
        )

    def add_component_uses(
        self,
        component_key: str,
        trigger: str | None = None,
        inputs: dict[str, str] | None = None,
        outputs: dict[str, str] | None = None,
        parameters: dict[str, Any] | None = None,
        title: str | None = None,
        id: Any = MISSING,
        description_file: str | None = None,
    ) -> "GraphConfigEditor":
        """edit.py:175-200."""
        if id is MISSING:
            id = random_node_id()
        return self.add_function_node_dict(
            {
                "uses": component_key,
                "trigger": trigger,
                "inputs": inputs,
                "outputs": outputs,
                "parameters": parameters,
                "title": title,
                "id": str(id) if id else id,
                "description_file": description_file,
            }
        )

    def add_table(
        self, name: str, id: Any = MISSING, schema: str | None = None
    ) -> "GraphConfigEditor":
        """edit.py:128-154."""
        if id is MISSING:
            id = random_node_id()
        d = {"table": name, "id": str(id) if id else id, "schema": schema}
        d = {k: v for (k, v) in d.items() if v is not None}
        for k in ("table", "stream", "id"):
            if d.get(k) and any(it.get(k) == d[k] for it in self.store_nodes()):
                raise ValueError(
                    f"{k} '{d[k]}' already defined in the graph configuration"
                )
        self._append_list_item("stores", d)
        return self

    def add_missing_node_ids(self) -> "GraphConfigEditor":
        """Add a random id to any node entry that doesn't specify one
        (edit.py:202-207)."""
        for key in ("functions", "stores"):
            span = self._block_span(key)
            if span is None:
                continue
            # Re-walk after every insertion: line numbers shift.
            changed = True
            while changed:
                changed = False
                for start, end in self._item_spans(key):
                    body = "\n".join(self._lines[start:end])
                    try:
                        parsed = yaml.safe_load(body)
                    except yaml.YAMLError:
                        continue
                    item = parsed[0] if isinstance(parsed, list) and parsed else None
                    if not isinstance(item, dict) or "id" in item:
                        continue
                    first = self._lines[start]
                    flow = re.match(r"^(\s*)- \{(.*)\}\s*$", first)
                    if flow:
                        self._lines[start] = (
                            f"{flow.group(1)}- {{{flow.group(2)}, "
                            f"id: {random_node_id()}}}"
                        )
                    else:
                        ind = " " * (self._item_indent + 2)
                        self._lines.insert(
                            start + 1, f"{ind}id: {random_node_id()}"
                        )
                    changed = True
                    break
        return self

    # -- low-level text surgery --------------------------------------------

    def _block_span(self, key: str) -> tuple[int, int] | None:
        """(start, end) line range of a top-level list block, where start is
        the ``key:`` line and end is exclusive."""
        pat = re.compile(rf"^{re.escape(key)}\s*:\s*(#.*)?$")
        for i, line in enumerate(self._lines):
            if pat.match(line):
                j = i + 1
                while j < len(self._lines):
                    ln = self._lines[j]
                    if ln and not ln[0].isspace() and not ln.startswith("#"):
                        break
                    j += 1
                return i, j
        return None

    def _item_spans(self, key: str) -> list[tuple[int, int]]:
        """Line ranges of each ``- `` item inside a top-level list block."""
        span = self._block_span(key)
        if span is None:
            return []
        start, end = span
        item_pat = re.compile(rf"^ {{0,{self._item_indent}}}- ")
        starts = [
            i for i in range(start + 1, end) if item_pat.match(self._lines[i])
        ]
        spans = []
        for n, s in enumerate(starts):
            e = starts[n + 1] if n + 1 < len(starts) else end
            # Trim trailing blank/comment-only lines from the item body.
            while e - 1 > s and (
                not self._lines[e - 1].strip()
                or self._lines[e - 1].lstrip().startswith("#")
            ):
                e -= 1
            spans.append((s, e))
        return spans

    def _render_item(self, d: dict) -> list[str]:
        """Render one dict as indented ``- key: value`` lines."""
        text = yaml.safe_dump(d, default_flow_style=False, sort_keys=False)
        lines = text.rstrip("\n").splitlines()
        ind = " " * self._item_indent
        out = [f"{ind}- {lines[0]}"]
        out.extend(f"{ind}  {ln}" for ln in lines[1:])
        return out

    def _append_list_item(self, key: str, d: dict) -> None:
        span = self._block_span(key)
        item = self._render_item(d)
        if span is None:
            # The key may still exist flow-style (`functions: [...]`) —
            # appending a second block key would shadow it. Convert that one
            # line to block style (all other lines untouched).
            flow_pat = re.compile(rf"^{re.escape(key)}\s*:\s*\[(.*)\]\s*(#.*)?$")
            for i, line in enumerate(self._lines):
                m = flow_pat.match(line)
                if m:
                    existing = yaml.safe_load(f"[{m.group(1)}]") or []
                    block = [f"{key}:" + (f"  {m.group(2)}" if m.group(2) else "")]
                    for it in existing:
                        block.extend(self._render_item(it))
                    self._lines[i:i + 1] = block + item
                    return
            self._lines.append(f"{key}:")
            self._lines.extend(item)
            return
        start, end = span
        # Insert after the last non-blank line of the block so trailing
        # blank lines / comments between blocks stay where they were.
        insert_at = end
        while insert_at - 1 > start and not self._lines[insert_at - 1].strip():
            insert_at -= 1
        self._lines[insert_at:insert_at] = item


# ---------------------------------------------------------------------------
# packaging helpers (helpers.py:84-126)
# ---------------------------------------------------------------------------


def directory_contents_to_upload(directory: Path) -> Iterator[Path]:
    """Files to package from a graph directory (helpers.py:90-114): inside a
    git work tree — whether the directory is the repo root, a nested app
    dir, or a worktree — exactly what git tracks or would track
    (``git ls-files -co --exclude-standard`` relative to the directory, so
    .gitignore anywhere up the repo is respected); otherwise a walk with
    the built-in ignore rules."""
    try:
        # -z: NUL-separated, unquoted — non-ASCII names come through raw
        # (default core.quotepath would C-quote them and break the paths).
        out = subprocess.check_output(
            ["git", "-C", str(directory), "ls-files", "-coz",
             "--exclude-standard"],
            stderr=subprocess.DEVNULL,
        )
        names = [n for n in out.decode().split("\0") if n]
        files = []
        for name in names:
            parts = Path(name).parts
            # Keep the built-in hygiene filters even under git: a repo
            # without a .gitignore would otherwise package .venv/.pyc junk.
            if any(d in _IGNORE_DIRS for d in parts[:-1]):
                continue
            if _IGNORE_RE.fullmatch(parts[-1]):
                continue
            p = Path(directory) / name
            if p.is_file():
                files.append(p)
        if files:
            yield from files
            return
        # Zero files (e.g. the whole dir is inside an enclosing repo's
        # ignored path): a graph dir always has at least graph.yml, so
        # fall through to the plain walk rather than package nothing.
    except (OSError, subprocess.CalledProcessError):
        pass  # not a git work tree / git unavailable: walk instead
    for dirname, dirnames, files in os.walk(directory, followlinks=True):
        dirnames[:] = [d for d in dirnames if d not in _IGNORE_DIRS]
        for f in sorted(files):
            if _IGNORE_RE.fullmatch(f):
                continue
            yield Path(dirname) / f


def compress_directory(directory: Path) -> io.BytesIO:
    """In-memory zip of a graph directory (helpers.py:117-126)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in directory_contents_to_upload(directory):
            zf.write(f, f.relative_to(directory).as_posix())
    buf.seek(0)
    buf.name = "graph_manifest.zip"
    return buf


# ---------------------------------------------------------------------------
# diffs (diffs.py:13-70)
# ---------------------------------------------------------------------------


@dataclass
class DiffResult:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    changed: dict[str, list[str]] = field(default_factory=dict)

    @property
    def is_not_empty(self) -> bool:
        return bool(self.added or self.removed or self.changed)

    @property
    def is_empty(self) -> bool:
        return not self.is_not_empty


def get_diffs_between_zip_and_dir(
    zf: zipfile.ZipFile, root: Path, from_remote: bool
) -> DiffResult:
    """File-level diff between a packaged graph and a directory
    (diffs.py:28-70). ``from_remote=True`` orients added/removed from the
    perspective of pulling the zip down onto the directory."""
    result = DiffResult()
    all_in_zip: set[str] = set()
    for zipinfo in zf.infolist():
        if zipinfo.is_dir():
            continue
        all_in_zip.add(zipinfo.filename)
        dst = root / zipinfo.filename
        if not dst.is_file():
            (result.added if from_remote else result.removed).append(
                zipinfo.filename
            )
            continue
        zip_bytes = zf.read(zipinfo)
        try:
            zip_content = zip_bytes.decode().splitlines(keepends=False)
            fs_content = dst.read_text().splitlines(keepends=False)
        except UnicodeDecodeError:
            if zip_bytes != dst.read_bytes():
                result.changed[zipinfo.filename] = [
                    f"--- <remote> {zipinfo.filename}",
                    f"+++ <local>  {zipinfo.filename}",
                    "Binary contents differ",
                ]
        else:
            if zip_content != fs_content:
                if from_remote:
                    zip_content, fs_content = fs_content, zip_content
                result.changed[zipinfo.filename] = list(
                    difflib.unified_diff(
                        zip_content,
                        fs_content,
                        fromfile=f"<remote> {zipinfo.filename}",
                        tofile=f"<local>  {zipinfo.filename}",
                        lineterm="",
                    )
                )
    if root.is_dir():
        for path in directory_contents_to_upload(root):
            file_name = path.relative_to(root).as_posix()
            if file_name not in all_in_zip:
                (result.removed if from_remote else result.added).append(
                    file_name
                )
    return result


def format_diffs(diffs: DiffResult, context: bool = False, full: bool = True) -> str:
    """Plain-text rendering of a DiffResult (diffs.py:73-101, sans rich)."""
    out: list[str] = []
    if full:
        if diffs.added:
            out.append("Added:")
            out.extend(f"- {a}" for a in diffs.added)
            out.append("")
        if diffs.removed:
            out.append("Deleted:")
            out.extend(f"- {a}" for a in diffs.removed)
            out.append("")
    if diffs.changed:
        out.append("Modified:")
        if context:
            for d in diffs.changed.values():
                out.extend(d)
                out.append("")
        else:
            out.extend(f"- {a}" for a in diffs.changed)
    return "\n".join(out).rstrip()


# ---------------------------------------------------------------------------
# directory editor (edit.py:235-369)
# ---------------------------------------------------------------------------


class GraphDirectoryEditor:
    """Operate on a whole graph directory: zip it, merge nodes in from
    files/zips with overwrite protection, assign missing ids."""

    def __init__(self, graph_path: Path | str, overwrite: bool = False):
        p = Path(graph_path)
        # A directory resolves to its graph.yml, which may not exist yet.
        self.yml_path = p if p.is_file() else p / "graph.yml"
        self.dir = self.yml_path.parent
        self.overwrite = overwrite
        self._editors: dict[Path, GraphConfigEditor] = {}
        self._cfg = (
            self._editor(self.yml_path) if self.yml_path.is_file() else None
        )

    def graph_slug(self) -> str:
        """Graph slug from the yaml, else the directory name (edit.py:253-259)."""
        name = (self._cfg.get_slug() if self._cfg else None) or self.dir.name
        return re.sub(r"[^a-zA-Z0-9]", "-", name)

    def compress_directory(self) -> io.BytesIO:
        return compress_directory(self.dir)

    def add_node_from_file(
        self, dst_path: Union[Path, str], file: IO[bytes]
    ) -> "GraphDirectoryEditor":
        """Write a file into the graph and register it (edit.py:265-273)."""
        dst_path = Path(dst_path)
        self._write_file(dst_path, file)
        self._add_cfg_node(dst_path)
        return self

    def add_node_from_zip(
        self,
        src_path: Union[Path, str],
        dst_path: Union[Path, str],
        zf: Union[zipfile.ZipFile, Path, IO[bytes]],
    ) -> "GraphDirectoryEditor":
        """Copy a node or whole subgraph out of a zip (edit.py:275-294)."""
        src_path = Path(src_path)
        dst_path = Path(dst_path)
        if isinstance(zf, zipfile.ZipFile):
            self._add(src_path, dst_path, zf)
        else:
            with zipfile.ZipFile(zf, "r") as f:
                self._add(src_path, dst_path, f)
        return self

    def add_missing_node_ids(self) -> "GraphDirectoryEditor":
        """Assign ids in every graph.yml under the directory (edit.py:296-304)."""
        for p in sorted(self.dir.rglob("graph.yml")):
            editor = self._editor(p)
            editor.add_missing_node_ids()
            editor.write()
        return self

    # -- internals ---------------------------------------------------------

    def _add(self, src_path: Path, dst_path: Path, zf: zipfile.ZipFile) -> None:
        if src_path.name == "graph.yml":
            def dirname(p: Path) -> str:
                return "" if len(p.parts) <= 1 else "/".join(p.parent.parts) + "/"

            src_dir = dirname(src_path)
            dst_dir = dirname(dst_path)
            for info in zf.infolist():
                if info.filename.startswith(src_dir) and not info.is_dir():
                    new_name = dst_dir + info.filename[len(src_dir):]
                    self._extract_file(info, Path(new_name), zf)
        else:
            self._extract_file(
                zf.getinfo("/".join(src_path.parts)), dst_path, zf
            )
        self._add_cfg_node(dst_path)

    def _add_cfg_node(self, dst_path: Path) -> None:
        if not self._cfg or str(dst_path) == "graph.yml":
            return
        try:
            self._cfg.add_node("/".join(dst_path.parts))
            self._cfg.write()
        except ValueError:
            pass  # node already registered; leave it unchanged

    def _extract_file(
        self, member: zipfile.ZipInfo, dst_path: Path, zf: zipfile.ZipFile
    ) -> None:
        full = self.dir / dst_path
        if full.is_dir():
            raise ValueError(
                f"Cannot extract {dst_path}: a directory by that name exists"
            )
        with zf.open(member, "r") as f:
            self._write_file(dst_path, f)

    def _write_file(self, dst_path: Path, file: IO[bytes]) -> None:
        full = self.dir / dst_path
        data = file.read()
        new_bytes = data.encode() if isinstance(data, str) else data
        if not self.overwrite and full.is_file():
            if full.read_bytes() != new_bytes:
                raise FileOverwriteError(
                    full,
                    f"Cannot extract {dst_path}: would overwrite existing file",
                )
        full.parent.mkdir(parents=True, exist_ok=True)
        full.write_bytes(new_bytes)

    def _editor(self, yaml_path: Path) -> GraphConfigEditor:
        ed = self._editors.get(yaml_path)
        if ed is None:
            ed = GraphConfigEditor(yaml_path)
            self._editors[yaml_path] = ed
        return ed
