"""graph.yml manifest model.

Shape defined operationally by the reference's editor and its tests
(`/root/reference/patterns/cli/configuration/edit.py:84-200`,
`tests/configuration/test_config_editor.py:92-141`):

- ``functions:`` list — each entry one of ``node_file`` (.py / .sql /
  nested graph.yml), ``webhook: name``, or ``uses: org/component@v1``; plus
  ``id``, ``title``, ``trigger`` (cron), ``inputs``/``outputs``
  (port→store maps), ``parameters``, ``description_file``.
- ``stores:`` list — ``{table: name, id, schema}`` or ``{stream: name}``.
- ``exposes: {inputs: [...], outputs: [...]}`` for subgraph port surfaces
  (`tests/cli/test_upload.py:17-19`).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pydantic import BaseModel, Field, model_validator

# `uses:` key regex from the reference (`services/download.py:9`)
COMPONENT_KEY_RE = re.compile(r"([\w\-]+)/([\w\-]+)@([\w\-.]+)")


class StoreSpec(BaseModel):
    name: str
    kind: str = "table"  # "table" | "stream"
    id: Optional[str] = None
    schema_name: Optional[str] = Field(default=None, alias="schema")
    # Declarative store config, applied on first engine access (the yaml
    # analogue of Table.init): merge keys, layout, and write-time data
    # expectations ({name: SQL bool expr}; mode record|fail|drop).
    unique_on: Optional[list[str]] = None
    partition_by: Optional[list[str]] = None
    cluster_by: Optional[list[str]] = None
    zorder_by: Optional[list[str]] = None
    bucket_by: Optional[list[str]] = None
    num_buckets: Optional[int] = None
    stats_columns: Optional[list[str]] = None
    expectations: Optional[dict[str, str]] = None
    expectations_mode: Optional[str] = None
    # Schema ordering roles (the reference's CommonModel
    # strictly_monotonic_ordering / created_ordering schema roles,
    # node.py:196-200): as_stream() resolves its default cursor column
    # from these when no order_by is passed.
    strictly_monotonic_ordering: Optional[str] = None
    created_ordering: Optional[str] = None
    # Governance: reject schema drift on writes instead of evolving.
    strict_schema: Optional[bool] = None
    # Build-once operator artifact (BPE merge table / tokenized vocab,
    # IVF centroids, quantizer stats, PQ codebooks, ANN index cells —
    # what the c14/c15/c20-c22 streaming maintainers keep fresh): a
    # node whose outputs are ALL artifact stores is a FIT node and is
    # skipped by run_graph once its artifacts exist (refit = explicit
    # run_node/trigger, or a streaming maintainer). Engine.artifact_
    # usage() / explain_node report which nodes read which artifact.
    artifact: Optional[bool] = None

    model_config = {"populate_by_name": True}


class NodeSpec(BaseModel):
    node_file: Optional[str] = None
    webhook: Optional[str] = None
    uses: Optional[str] = None
    id: Optional[str] = None
    title: Optional[str] = None
    trigger: Optional[str] = None
    inputs: dict[str, str] = Field(default_factory=dict)   # port -> store
    outputs: dict[str, str] = Field(default_factory=dict)  # port -> store
    parameters: dict[str, Any] = Field(default_factory=dict)
    description_file: Optional[str] = None

    @model_validator(mode="after")
    def _one_kind(self) -> "NodeSpec":
        kinds = [k for k in (self.node_file, self.webhook, self.uses) if k]
        if len(kinds) != 1:
            raise ValueError(
                "function entry must have exactly one of node_file / webhook / uses"
            )
        if self.uses and not COMPONENT_KEY_RE.fullmatch(self.uses):
            raise ValueError(f"invalid component key: {self.uses!r}")
        return self

    @property
    def kind(self) -> str:
        if self.webhook:
            return "webhook"
        if self.uses:
            return "component"
        assert self.node_file
        if self.node_file.endswith(".sql"):
            return "sql"
        if self.node_file.endswith((".yml", ".yaml")):
            return "subgraph"
        return "python"

    @property
    def display_name(self) -> str:
        return self.title or self.node_file or self.webhook or self.uses or "?"


class ExposesSpec(BaseModel):
    inputs: list[str] = Field(default_factory=list)
    outputs: list[str] = Field(default_factory=list)


class GraphSpec(BaseModel):
    title: Optional[str] = None
    slug: Optional[str] = None
    functions: list[NodeSpec] = Field(default_factory=list)
    stores: list[StoreSpec] = Field(default_factory=list)
    exposes: ExposesSpec = Field(default_factory=ExposesSpec)
    path: Optional[str] = None  # directory containing graph.yml

    def store_names(self) -> set[str]:
        names = {s.name for s in self.stores}
        # a webhook auto-creates its output table (create.py:177-197)
        names |= {n.webhook for n in self.functions if n.webhook}
        return names
