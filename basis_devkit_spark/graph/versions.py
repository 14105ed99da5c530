"""Graph-version service: every ``upload`` snapshots the app.

Behavioral spec: `/root/reference/patterns/cli/services/graph_versions.py`
(the hosted service creates a graph version per upload;
``get_latest_graph_version`` resolves the active one) — locally each upload
zips the app directory (same ignore rules as component packaging,
`graph/edit.py:compress_directory`) into ``<root>/_graph_versions/`` with a
JSON manifest, so a bad edit can be diffed against and restored from any
retained version.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from pathlib import Path
from typing import Any

from basis_devkit_spark.graph.edit import (
    compress_directory,
    format_diffs,
    get_diffs_between_zip_and_dir,
)

_DIR = "_graph_versions"
_MANIFEST = "manifest.json"


def _vdir(root: str) -> str:
    return os.path.join(root, _DIR)


def _manifest_path(root: str) -> str:
    return os.path.join(_vdir(root), _MANIFEST)


def _load(root: str) -> dict[str, Any]:
    p = _manifest_path(root)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"next_version": 1, "versions": []}


def _save(root: str, m: dict[str, Any]) -> None:
    os.makedirs(_vdir(root), exist_ok=True)
    with open(_manifest_path(root), "w") as f:
        json.dump(m, f, indent=2)


def snapshot_graph(root: str, app_dir: str) -> dict[str, Any]:
    """Zip ``app_dir`` as the next graph version; returns its manifest row."""
    m = _load(root)
    v = m["next_version"]
    content = compress_directory(Path(app_dir))
    os.makedirs(_vdir(root), exist_ok=True)
    zpath = os.path.join(_vdir(root), f"v{v}.zip")
    with open(zpath, "wb") as f:
        f.write(content.getvalue())
    with zipfile.ZipFile(io.BytesIO(content.getvalue())) as zf:
        n_files = len([n for n in zf.namelist() if not n.endswith("/")])
    row = {"version": v, "app": os.path.abspath(app_dir), "files": n_files}
    m["versions"].append(row)
    m["next_version"] = v + 1
    _save(root, m)
    return row


def list_graph_versions(root: str) -> list[dict[str, Any]]:
    m = _load(root)
    latest = m["versions"][-1]["version"] if m["versions"] else None
    return [{**r, "latest": r["version"] == latest} for r in m["versions"]]


def restore_graph_version(
    root: str,
    version: int,
    dest: str,
    force: bool = False,
    show_diff: bool = False,
) -> tuple[bool, str]:
    """Extract version ``version`` into ``dest`` with the same conflict
    protection as component pull: refuse (returning the diff text) when it
    would overwrite changed files, unless ``force``."""
    zpath = os.path.join(_vdir(root), f"v{version}.zip")
    if not os.path.exists(zpath):
        raise FileNotFoundError(f"no graph version {version} at {root}")
    with zipfile.ZipFile(zpath) as zf:
        if not force:
            conflicts = get_diffs_between_zip_and_dir(zf, Path(dest), True)
            if conflicts.changed:
                return False, format_diffs(conflicts, context=show_diff, full=False)
        zf.extractall(dest)
    return True, ""
