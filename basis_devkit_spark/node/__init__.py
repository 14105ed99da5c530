"""Public node SDK — the live, Spark-backed implementation of the API the
reference ships as typed stubs (`/root/reference/patterns/node/node.py`)."""

from basis_devkit_spark.node.params import Connection, Parameter
from basis_devkit_spark.node.state import State
from basis_devkit_spark.node.stream import Stream
from basis_devkit_spark.node.table import Table, TableVersion


def respond_to_request(request_key: str, payload: dict) -> None:
    """Respond to a waiting webhook request (node.py:544-553): ``payload``
    is JSON-encoded as the HTTP response body for the request whose
    ingested rows carry ``patterns_request_key == request_key``. Must be
    called from inside a node execution."""
    from basis_devkit_spark.engine.context import current

    ctx = current()
    if ctx is None:
        raise RuntimeError(
            "respond_to_request must be called from inside a running node"
        )
    ctx.engine.respond_to_request(request_key, payload)


__all__ = [
    "Table",
    "TableVersion",
    "Stream",
    "State",
    "Parameter",
    "Connection",
    "respond_to_request",
]
