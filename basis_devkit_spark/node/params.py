"""Parameter / Connection — typed scalar node config.

Behavioral spec: `/root/reference/patterns/node/node.py:508-542`.
Allowed types: str, int, float, bool, datetime, date, list, Connection
(node.py:513). A Parameter with no default is required; a missing value is
a graph validation error (mirroring the server error string at
`cli/commands/upload.py:79-82`).
"""

from __future__ import annotations

from datetime import date, datetime
from typing import Any

_MISSING = object()

PARAMETER_TYPES = {
    "str": str,
    "text": str,
    "int": int,
    "float": float,
    "bool": bool,
    "datetime": datetime,
    "date": date,
    "list": list,
}


def _coerce(value: Any, type_name: str | None) -> Any:
    if isinstance(value, str) and value.startswith("secret://"):
        # Local analogue of the server injecting org secrets into graph
        # parameters (cli/services/secrets.py): resolve before coercion so
        # a secret holding "42" still coerces to its declared type.
        from basis_devkit_spark.secrets import maybe_resolve_ref

        value = maybe_resolve_ref(value)
    if value is None or type_name is None:
        return value
    t = type_name.lower()
    if t in ("str", "text"):
        return str(value)
    if t == "int":
        return int(value)
    if t == "float":
        return float(value)
    if t == "bool":
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)
    if t == "datetime":
        return value if isinstance(value, datetime) else datetime.fromisoformat(str(value))
    if t == "date":
        if isinstance(value, date) and not isinstance(value, datetime):
            return value
        return date.fromisoformat(str(value)[:10])
    if t == "list":
        return list(value) if not isinstance(value, str) else [v.strip() for v in value.split(",")]
    if t == "connection":
        return dict(value)
    return value


class Parameter:
    def __init__(
        self,
        name: str | None = None,
        description: str | None = None,
        type: str = "str",
        default: Any = _MISSING,
    ):
        self.name = name
        self.description = description
        self.type = type
        self.default = default
        self._value: Any = _MISSING
        from basis_devkit_spark.engine import context as _ctx

        active = _ctx.current()
        if active is not None:
            active.resolve_parameter(self)

    @property
    def required(self) -> bool:
        return self.default is _MISSING

    def bind(self, value: Any = _MISSING) -> None:
        if value is _MISSING:
            if self.required:
                # matches the server-side analyzer's error surface
                # (upload.py:79-82)
                raise ValueError(
                    f"Parameter {self.name} has no default and no value was provided"
                )
            value = self.default
        self._value = _coerce(value, self.type)

    @property
    def value(self) -> Any:
        if self._value is _MISSING:
            self.bind()
        return self._value

    def __repr__(self) -> str:
        return f"Parameter({self.name!r}, type={self.type!r}, value={self._value!r})"


class Connection(Parameter):
    """A parameter holding a dict of connection config (node.py:508-510);
    in our engine this becomes options for ``spark.read.format(...)``."""

    def __init__(self, connection_type: str, name: str | None = None, description: str | None = None):
        super().__init__(name=name, description=description, type="connection", default={})
        self.connection_type = connection_type
