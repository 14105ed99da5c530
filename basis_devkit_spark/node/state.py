"""State — per-node kv store + execution control.

Behavioral spec: `/root/reference/patterns/node/node.py:417-505`.
``should_continue`` defaults: stop at 80% of the execution time limit or
120 s before it, whichever is greater (node.py:473-474); the platform limit
is ~10 minutes (node.py:469). ``request_new_run`` asks the scheduler for a
follow-up execution after this one commits (node.py:482-500).
"""

from __future__ import annotations

import time
from datetime import datetime
from typing import Any

DEFAULT_EXECUTION_LIMIT_S = 600.0  # ~10-minute platform limit (node.py:469)


class State:
    def __init__(self):
        self._data: dict[str, Any] = {}
        self._started_at: float = time.monotonic()
        self._limit_s: float = DEFAULT_EXECUTION_LIMIT_S
        self._new_run_requested: dict | None = None
        self._persist_cb = None  # engine hook
        from basis_devkit_spark.engine import context as _ctx

        active = _ctx.current()
        if active is not None:
            active.register_state(self)

    # ---------------- binding (engine) ----------------
    def bind(self, data: dict[str, Any], limit_s: float | None = None, persist_cb=None):
        self._data = data
        if limit_s is not None:
            self._limit_s = limit_s
        self._started_at = time.monotonic()
        self._persist_cb = persist_cb

    # ---------------- kv (node.py:423-463) ----------------
    def set(self, state: dict[str, Any]) -> None:
        """Replace the whole state dict."""
        self._data.clear()
        self._data.update(state)

    def set_value(self, key: str, value: Any) -> None:
        self._data[key] = value

    def get(self) -> dict[str, Any]:
        return dict(self._data)

    def get_value(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def get_datetime(self, key: str, default: datetime | None = None) -> datetime | None:
        v = self._data.get(key)
        if v is None:
            return default
        if isinstance(v, datetime):
            return v
        return datetime.fromisoformat(str(v))

    def reset(self) -> None:
        self._data.clear()

    # ---------------- execution control (A18, A19) ----------------
    def should_continue(
        self, pct_of_limit: float = 80.0, seconds_till_limit: float = 120.0
    ) -> bool:
        """False when approaching the execution time limit (node.py:465-480):
        past pct_of_limit% of the limit, or within seconds_till_limit of it —
        whichever threshold is *earlier-stopping* per the reference default
        ('whichever greater' margin)."""
        elapsed = time.monotonic() - self._started_at
        by_pct = self._limit_s * (pct_of_limit / 100.0)
        by_margin = self._limit_s - seconds_till_limit
        stop_at = min(by_pct, by_margin) if by_margin > 0 else by_pct
        return elapsed < stop_at

    def request_new_run(
        self, trigger_downstream: bool = True, wait_atleast_seconds: int = 0
    ) -> None:
        """Ask the scheduler to run this node again after this execution
        commits (node.py:482-500)."""
        self._new_run_requested = {
            "trigger_downstream": trigger_downstream,
            "wait_atleast_seconds": wait_atleast_seconds,
        }

    @property
    def new_run_requested(self) -> dict | None:
        return self._new_run_requested
