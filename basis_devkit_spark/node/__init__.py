"""Public node SDK — the live, Spark-backed implementation of the API the
reference ships as typed stubs (`/root/reference/patterns/node/node.py`)."""

from basis_devkit_spark.node.params import Connection, Parameter
from basis_devkit_spark.node.state import State
from basis_devkit_spark.node.stream import Stream
from basis_devkit_spark.node.table import Table, TableVersion

__all__ = ["Table", "TableVersion", "Stream", "State", "Parameter", "Connection"]
