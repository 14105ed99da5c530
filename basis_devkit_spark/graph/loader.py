"""graph.yml loading, discovery, validation, id assignment.

Mirrors the reference client pipeline:
- directory-walk discovery of the owning graph.yml
  (`/root/reference/patterns/cli/services/lookup.py:213-250`)
- recursive load of subgraph manifests (`configuration/edit.py:235-369`)
- random 8-char base36 ids for entries missing one
  (`configuration/edit.py:202-207`, `cli/helpers.py:128-132`)
- validation errors matching the server analyzer's strings
  (`cli/commands/upload.py:74-83`)
"""

from __future__ import annotations

import os
import secrets
import string
from typing import Any

import yaml

from basis_devkit_spark.graph.spec import GraphSpec, NodeSpec, StoreSpec

_ALPHABET = string.digits + string.ascii_lowercase  # base36, helpers.py:128


def random_node_id() -> str:
    """8-char base36 id (helpers.py:131-132)."""
    return "".join(secrets.choice(_ALPHABET) for _ in range(8))


class GraphValidationError(ValueError):
    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("; ".join(errors))


def find_graph_file(start: str) -> str:
    """Walk up from ``start`` to the owning graph.yml (lookup.py:213-250)."""
    d = os.path.abspath(start)
    if os.path.isfile(d):
        d = os.path.dirname(d)
    while True:
        for name in ("graph.yml", "graph.yaml"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
        parent = os.path.dirname(d)
        if parent == d:
            raise FileNotFoundError(f"no graph.yml found above {start}")
        d = parent


def _parse_stores(raw: list[dict[str, Any]] | None) -> list[StoreSpec]:
    out = []
    for entry in raw or []:
        e = dict(entry)
        if "table" in e:
            out.append(StoreSpec(name=e.pop("table"), kind="table", **e))
        elif "stream" in e:
            out.append(StoreSpec(name=e.pop("stream"), kind="stream", **e))
        else:
            raise GraphValidationError([f"store entry must have table: or stream: ({entry})"])
    return out


def _parse_ports(raw: Any) -> dict[str, str]:
    """inputs/outputs may be a {port: store} map, or a list of names
    (port == store), or a single name."""
    if raw is None:
        return {}
    if isinstance(raw, dict):
        return {str(k): str(v) for k, v in raw.items()}
    if isinstance(raw, str):
        return {raw: raw}
    if isinstance(raw, list):
        out = {}
        for item in raw:
            if isinstance(item, dict):
                out.update({str(k): str(v) for k, v in item.items()})
            else:
                out[str(item)] = str(item)
        return out
    raise GraphValidationError([f"invalid inputs/outputs: {raw!r}"])


def load_graph(path: str, _depth: int = 0) -> GraphSpec:
    """Parse graph.yml (or a directory containing one) into a GraphSpec,
    expanding subgraphs inline (port-prefixed) and assigning missing ids."""
    if _depth > 10:
        raise GraphValidationError(["subgraph nesting too deep (cycle?)"])
    if os.path.isdir(path):
        path = find_graph_file(path)
    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    functions: list[NodeSpec] = []
    for entry in raw.get("functions") or []:
        e = dict(entry)
        e["inputs"] = _parse_ports(e.get("inputs"))
        e["outputs"] = _parse_ports(e.get("outputs"))
        functions.append(NodeSpec(**e))

    spec = GraphSpec(
        title=raw.get("title"),
        slug=raw.get("slug"),
        functions=functions,
        stores=_parse_stores(raw.get("stores")),
        exposes=raw.get("exposes") or {"inputs": [], "outputs": []},
        path=base_dir,
    )
    for n in spec.functions:
        if not n.id:
            n.id = random_node_id()
    for s in spec.stores:
        if not s.id:
            s.id = random_node_id()

    spec = _expand_subgraphs(spec, base_dir, _depth)
    validate(spec)
    return spec


def _expand_subgraphs(spec: GraphSpec, base_dir: str, depth: int) -> GraphSpec:
    """Inline-expand nested graph.yml nodes (create.py:153-155) AND
    registry-resolved ``uses:`` components (download.py:9-21): the inner
    graph's exposed input/output ports are rewired to the parent's
    connected stores; internal stores are namespaced by node id.
    Components whose key is not in the local registry pass through to the
    engine's in-process callable registry."""
    from basis_devkit_spark.graph.components import component_path

    out_functions: list[NodeSpec] = []
    out_stores = list(spec.stores)
    for n in spec.functions:
        if n.kind == "subgraph":
            sub_path = os.path.join(base_dir, n.node_file)
        elif n.kind == "component":
            resolved = component_path(n.uses or "")
            if resolved is None:
                out_functions.append(n)  # engine-registered callable path
                continue
            sub_path = find_graph_file(resolved)
        else:
            out_functions.append(n)
            continue
        sub = load_graph(sub_path, _depth=depth + 1)
        prefix = f"{n.id}__"
        exposed_in = set(sub.exposes.inputs)
        exposed_out = set(sub.exposes.outputs)

        def rewire(store: str) -> str:
            if store in exposed_in and store in n.inputs.values():
                return store  # bound below via port map
            if store in exposed_in:
                # exposed input port bound by port-name match
                return n.inputs.get(store, prefix + store)
            if store in exposed_out:
                return n.outputs.get(store, prefix + store)
            return prefix + store

        for s in sub.stores:
            if s.name in exposed_in or s.name in exposed_out:
                continue  # becomes the parent's store via rewiring
            clone_s = s.model_copy(deep=True)
            clone_s.name = prefix + s.name
            clone_s.id = prefix + (s.id or "")
            out_stores.append(clone_s)  # keeps store config (expectations &c)
        for sn in sub.functions:
            clone = sn.model_copy(deep=True)
            clone.id = prefix + (sn.id or random_node_id())
            if clone.node_file:
                clone.node_file = os.path.join(
                    os.path.relpath(os.path.dirname(sub_path), base_dir), sn.node_file
                )
            clone.inputs = {p: rewire(s) for p, s in sn.inputs.items()}
            clone.outputs = {p: rewire(s) for p, s in sn.outputs.items()}
            # parent-level parameter overrides
            clone.parameters = {**clone.parameters, **n.parameters}
            out_functions.append(clone)
    return GraphSpec(
        title=spec.title,
        slug=spec.slug,
        functions=out_functions,
        stores=out_stores,
        exposes=spec.exposes,
        path=spec.path,
    )


def validate(spec: GraphSpec) -> None:
    """Graph-level validation with the reference's error surface
    (upload.py:78-82): unconnected inputs, unknown stores, duplicate ids."""
    errors: list[str] = []
    known = spec.store_names()
    exposed = set(spec.exposes.inputs) | set(spec.exposes.outputs)
    seen_ids: set[str] = set()
    for n in spec.functions:
        if n.id in seen_ids:
            errors.append(f"duplicate node id: {n.id}")
        seen_ids.add(n.id)
        for port, store in n.inputs.items():
            if store not in known and store not in exposed:
                errors.append(
                    f"Top level input is not connected: node '{n.display_name}' "
                    f"input '{port}' references unknown store '{store}'"
                )
        for port, store in n.outputs.items():
            if store not in known and store not in exposed:
                errors.append(
                    f"node '{n.display_name}' output '{port}' references "
                    f"unknown store '{store}'"
                )
    if errors:
        raise GraphValidationError(errors)
