"""Local component registry: publish / fetch of ``org/name@version`` apps.

The reference resolves ``uses:`` keys by downloading a zipped graph from
the hosted registry (`/root/reference/patterns/cli/services/download.py:9-21`
— COMPONENT_RE + component_download; publishing via
`cli/commands/upload.py:74-97` --publish-component). The local equivalent
is a filesystem registry: ``publish_component`` copies a validated app
directory under ``<registry>/<org>/<name>@<version>/``; the loader resolves
the same key back to that directory and inline-expands it like a subgraph,
applying the using node's ``inputs``/``outputs``/``parameters`` mappings.

Unresolvable keys fall back to the engine's in-process callable registry
(``engine.register_component``), so programmatic components keep working.
"""

from __future__ import annotations

import os
import re
import shutil

# Same key shape as the reference (download.py:9).
COMPONENT_RE = re.compile(r"([\w\-]+)/([\w\-]+)@([\w\-.]+)")

ENV_VAR = "BASIS_DEVKIT_SPARK_COMPONENTS"


def default_registry() -> str:
    return os.environ.get(ENV_VAR) or os.path.expanduser(
        "~/.basis_devkit_spark/components"
    )


def component_path(key: str, registry: str | None = None) -> str | None:
    """Resolve ``org/name@version`` to a registry directory, or None if the
    key is not component-shaped or not published locally."""
    m = COMPONENT_RE.fullmatch(key or "")
    if not m:
        return None
    org, name, ver = m.groups()
    roots = ([registry] if registry else []) + [default_registry()]
    for root in roots:
        p = os.path.join(root, org, f"{name}@{ver}")
        if os.path.isdir(p):
            return p
    return None


def set_deprecated(key: str, deprecated: bool, registry: str | None = None) -> None:
    """Mark a published component deprecated (update.py:28-41 semantics:
    deprecated components cannot be added to NEW apps but keep resolving
    for existing ones)."""
    import json

    p = component_path(key, registry)
    if p is None:
        raise ValueError(f"component not published locally: {key}")
    meta_path = p + "._meta.json"  # sibling file: never shipped with the dir
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta["deprecated"] = bool(deprecated)
    with open(meta_path, "w") as f:
        json.dump(meta, f)


def is_deprecated(key: str, registry: str | None = None) -> bool:
    import json

    p = component_path(key, registry)
    if p is None:
        return False
    meta_path = p + "._meta.json"
    if not os.path.exists(meta_path):
        return False
    with open(meta_path) as f:
        return bool(json.load(f).get("deprecated"))


def publish_component(app_path: str, key: str, registry: str | None = None) -> str:
    """Validate and copy an app directory into the registry under ``key``.
    Republish (same key) replaces the previous copy — versions are part of
    the key, so pinned consumers are unaffected by new versions."""
    m = COMPONENT_RE.fullmatch(key or "")
    if not m:
        raise ValueError(
            f"component key must look like org/name@version, got {key!r}"
        )
    from basis_devkit_spark.graph.loader import find_graph_file, load_graph

    load_graph(app_path)  # validate before publish (upload.py:67 analyzer gate)
    src = os.path.dirname(find_graph_file(app_path))
    org, name, ver = m.groups()
    dst = os.path.join(registry or default_registry(), org, f"{name}@{ver}")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copytree(src, dst)
    return dst
