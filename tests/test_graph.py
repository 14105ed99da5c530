"""Graph compiler tests mirroring the reference's own test concerns
(SURVEY §5.1): manifest shapes, id assignment, validation errors, subgraph
expansion, cron, discovery."""

import os
import textwrap
from datetime import datetime

import pytest

from basis_devkit_spark.engine.cron import cron_matches, next_fire
from basis_devkit_spark.graph.loader import (
    GraphValidationError,
    find_graph_file,
    load_graph,
    random_node_id,
)


def write_app(tmp_path, yml, **files):
    (tmp_path / "graph.yml").write_text(textwrap.dedent(yml))
    for name, content in files.items():
        p = tmp_path / name.replace("__", "/")
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(content))
    return str(tmp_path)


def test_load_full_fields(tmp_path):
    path = write_app(
        tmp_path,
        """
        title: graph
        functions:
          - webhook: hook
          - node_file: node.py
            trigger: 1 * * * *
            inputs:
              node_in: hook
            outputs:
              node_out: my_table
            parameters:
              limit: 2
            title: my node
            id: ab234567
        stores:
          - table: my_table
        """,
        **{"node.py": "pass"},
    )
    g = load_graph(path)
    node = [n for n in g.functions if n.node_file][0]
    assert node.id == "ab234567"
    assert node.trigger == "1 * * * *"
    assert node.inputs == {"node_in": "hook"}
    assert node.parameters == {"limit": 2}
    # webhook auto-creates its table (create.py:177-197)
    assert "hook" in g.store_names()


def test_missing_ids_assigned(tmp_path):
    path = write_app(
        tmp_path,
        """
        functions:
          - node_file: a.py
        stores:
          - table: t
        """,
        **{"a.py": "pass"},
    )
    g = load_graph(path)
    assert g.functions[0].id and len(g.functions[0].id) == 8
    assert g.stores[0].id


def test_random_node_id_format():
    nid = random_node_id()
    assert len(nid) == 8 and nid.isalnum() and nid == nid.lower()


def test_validation_unknown_store(tmp_path):
    path = write_app(
        tmp_path,
        """
        functions:
          - node_file: a.py
            inputs:
              x: nope
        """,
        **{"a.py": "pass"},
    )
    with pytest.raises(GraphValidationError, match="not connected"):
        load_graph(path)


def test_node_must_have_one_kind(tmp_path):
    path = write_app(
        tmp_path,
        """
        functions:
          - title: no kind
        """,
    )
    with pytest.raises(Exception, match="exactly one"):
        load_graph(path)


def test_component_key_regex(tmp_path):
    path = write_app(
        tmp_path,
        """
        functions:
          - uses: not a component key
        """,
    )
    with pytest.raises(Exception, match="invalid component key"):
        load_graph(path)


def test_subgraph_expansion(tmp_path):
    path = write_app(
        tmp_path,
        """
        title: root
        functions:
          - node_file: sub/graph.yml
            id: subnode1
            inputs:
              sub_in: src
            outputs:
              sub_out: dst
        stores:
          - table: src
          - table: dst
        """,
        **{
            "sub__graph.yml": """
            title: sub
            exposes:
              inputs:
                - sub_in
              outputs:
                - sub_out
            functions:
              - node_file: inner.sql
                id: inner1
                inputs:
                  sub_in: sub_in
                outputs:
                  sub_out: sub_out
            stores:
              - table: sub_in
              - table: sub_out
            """,
            "sub__inner.sql": "select * from {{ sub_in }}",
        },
    )
    g = load_graph(path)
    inner = [n for n in g.functions if n.node_file and "inner" in n.node_file]
    assert len(inner) == 1
    assert inner[0].id == "subnode1__inner1"
    assert inner[0].inputs == {"sub_in": "src"}
    assert inner[0].outputs == {"sub_out": "dst"}


def test_find_graph_file_walks_up(tmp_path):
    (tmp_path / "graph.yml").write_text("title: g")
    nested = tmp_path / "a" / "b"
    nested.mkdir(parents=True)
    assert find_graph_file(str(nested)) == str(tmp_path / "graph.yml")
    with pytest.raises(FileNotFoundError):
        find_graph_file("/nonexistent_dir_xyz" if not os.path.exists("/nonexistent_dir_xyz") else str(tmp_path))


def test_cron_matching():
    assert cron_matches("1 * * * *", datetime(2026, 8, 13, 10, 1))
    assert not cron_matches("1 * * * *", datetime(2026, 8, 13, 10, 2))
    assert cron_matches("*/15 2 * * *", datetime(2026, 8, 13, 2, 45))
    # 2026-08-16 is a Sunday (cron dow 0)
    assert cron_matches("0 0 * * 0", datetime(2026, 8, 16, 0, 0))
    assert not cron_matches("0 0 * * 1", datetime(2026, 8, 16, 0, 0))
    nf = next_fire("30 3 * * *", datetime(2026, 8, 13, 10, 0))
    assert nf == datetime(2026, 8, 14, 3, 30)
    with pytest.raises(ValueError):
        cron_matches("bad cron", datetime.now())


def test_component_fetch_from_registry(tmp_path, monkeypatch):
    """uses: org/name@v1 resolves from the local registry and inline-expands
    with the consumer's inputs/outputs/parameters mappings (reference
    download.py:9-21 key resolution)."""
    from basis_devkit_spark.graph.components import publish_component

    comp = tmp_path / "comp"
    comp.mkdir()
    write_app(
        comp,
        """
        exposes:
          inputs: [src_t]
          outputs: [dst_t]
        functions:
          - node_file: scale.py
            id: scale
            inputs:
              src: src_t
            outputs:
              dst: dst_t
            parameters:
              factor: 2
        """,
        **{"scale.py": "# placeholder\n"},
    )
    registry = str(tmp_path / "registry")
    monkeypatch.setenv("BASIS_DEVKIT_SPARK_COMPONENTS", registry)
    publish_component(str(comp), "org/scaler@v1", registry=registry)

    app = tmp_path / "app"
    app.mkdir()
    write_app(
        app,
        """
        functions:
          - uses: org/scaler@v1
            id: usenode
            inputs:
              src_t: numbers
            outputs:
              dst_t: scaled
            parameters:
              factor: 5
        stores:
          - table: numbers
          - table: scaled
        """,
    )
    g = load_graph(str(app))
    # the uses: node was replaced by the component's internal node
    assert [n.kind for n in g.functions] == ["python"]
    inner = g.functions[0]
    assert inner.id == "usenode__scale"
    assert inner.inputs == {"src": "numbers"}
    assert inner.outputs == {"dst": "scaled"}
    assert inner.parameters["factor"] == 5  # consumer override wins
    # the component's node file resolves from the registry copy
    resolved = os.path.join(str(app), inner.node_file)
    assert os.path.exists(resolved)
    assert registry in os.path.abspath(resolved)


def test_component_unresolved_key_falls_through(tmp_path, monkeypatch):
    monkeypatch.setenv("BASIS_DEVKIT_SPARK_COMPONENTS", str(tmp_path / "empty"))
    app = tmp_path / "app"
    app.mkdir()
    write_app(
        app,
        """
        functions:
          - uses: nowhere/ghost@v9
            id: ghostnode
        stores: []
        """,
    )
    g = load_graph(str(app))
    assert g.functions[0].kind == "component"  # engine callable path


def test_publish_rejects_bad_key_and_invalid_app(tmp_path):
    from basis_devkit_spark.graph.components import publish_component

    comp = tmp_path / "c"
    comp.mkdir()
    write_app(comp, "functions: []\nstores: []\n")
    with pytest.raises(ValueError, match="org/name@version"):
        publish_component(str(comp), "not-a-key")
