"""Decorator-style node SDK.

The reference's test fixtures use a newer server-side SDK style the devkit
never executes client-side (`tests/configuration/utils.py:6-14`,
`tests/cli/test_upload.py:27-29`):

    from patterns import *

    @node
    def node_fn(output=OutputTable, src=InputTable, limit=Parameter(default=10)):
        ...

Ports are declared by parameter defaults; the port name is the argument
name. Our engine executes these: module import just defines the function;
the python-node executor then calls it with live objects injected —
``InputTable``/``OutputTable`` → bound :class:`Table`, ``InputStream`` →
``Table.as_stream()``, ``State`` → live state, ``Parameter(...)`` →
resolved value.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable

from basis_devkit_spark.node.params import Parameter
from basis_devkit_spark.node.state import State
from basis_devkit_spark.node.table import Table


class _PortMarker:
    """Marker classes usable directly as defaults (``x=OutputTable``) or
    instantiated with options (``x=OutputTable(description=...)``)."""

    mode = "r"
    as_stream = False

    def __init__(self, description: str | None = None, schema: str | None = None):
        self.description = description
        self.schema = schema


class InputTable(_PortMarker):
    mode = "r"


class OutputTable(_PortMarker):
    mode = "w"


class InputStream(_PortMarker):
    mode = "r"
    as_stream = True


class OutputStream(_PortMarker):
    mode = "w"


def _is_marker(v: Any) -> bool:
    return (isinstance(v, type) and issubclass(v, _PortMarker)) or isinstance(
        v, _PortMarker
    )


def node(fn: Callable) -> Callable:
    """Mark a function as a node; the engine invokes it with ports bound."""
    fn.__is_node__ = True
    fn.__node_ports__ = dict(inspect.signature(fn).parameters)
    return fn


def build_node_kwargs(fn: Callable) -> dict[str, Any]:
    """Construct the injected arguments for a decorated node function.

    Must run inside an active ExecutionContext: the Table/State/Parameter
    constructors self-register and bind there (bind-at-declaration).
    """
    kwargs: dict[str, Any] = {}
    for name, param in inspect.signature(fn).parameters.items():
        default = param.default
        if _is_marker(default):
            marker = default if isinstance(default, _PortMarker) else default()
            t = Table(name, marker.mode, description=marker.description)
            if getattr(default, "as_stream", False) or marker.as_stream:
                kwargs[name] = t.as_stream() if t.is_connected else t
            else:
                kwargs[name] = t
        elif isinstance(default, Parameter):
            p = Parameter(
                name=default.name or name,
                description=default.description,
                type=default.type,
                default=default.default,
            )
            kwargs[name] = p.value
        elif isinstance(default, State) or (
            isinstance(default, type) and issubclass(default, State)
        ):
            kwargs[name] = State()
        elif default is inspect.Parameter.empty:
            raise TypeError(
                f"node argument '{name}' needs a port/parameter default "
                "(InputTable, OutputTable, Parameter(...), State, ...)"
            )
        else:
            kwargs[name] = default
    return kwargs
