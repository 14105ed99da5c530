"""Per-node key-value state store (node.py:417-505 semantics).

One JSON document per node id under ``<root>/_state/``; atomic replace on
commit. State is driver-side metadata (small), never a Spark dataset.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Any


class StateStore:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_state")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, node_id: str) -> str:
        return os.path.join(self.dir, f"{node_id}.json")

    def load(self, node_id: str) -> dict[str, Any]:
        p = self._path(node_id)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def save(self, node_id: str, state: dict[str, Any]) -> None:
        tmp = self._path(node_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, default=_json_default)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(node_id))

    def reset(self, node_id: str) -> None:
        try:
            os.remove(self._path(node_id))
        except FileNotFoundError:
            pass


def _json_default(o: Any) -> Any:
    if isinstance(o, datetime):
        return o.isoformat()
    raise TypeError(f"not JSON serializable: {type(o)}")
