"""basis-devkit-spark — a PySpark-native engine with the query and
data-processing capabilities of basis-os/basis-devkit ("patterns").

Public surface:
- node SDK: ``Table, Stream, State, Parameter, Connection``
  (live Spark-backed implementations of the reference's typed stubs,
  `/root/reference/patterns/node/node.py`)
- ``Engine``: graph loading (graph.yml), node execution, scheduling
- ``operators``: LLM-data-pipeline extensions (dedup, similarity search,
  text analysis, multimodal columns) — SURVEY.md §2.D
"""

__version__ = "0.1.0"

from basis_devkit_spark.engine import Engine
from basis_devkit_spark.node import (
    Connection,
    Parameter,
    State,
    Stream,
    Table,
    respond_to_request,
)
from basis_devkit_spark.node.decorator import (
    InputStream,
    InputTable,
    OutputStream,
    OutputTable,
    node,
)
from basis_devkit_spark.session import get_spark

__all__ = [
    "Engine",
    "Table",
    "Stream",
    "State",
    "Parameter",
    "Connection",
    "node",
    "InputTable",
    "OutputTable",
    "InputStream",
    "OutputStream",
    "get_spark",
    "respond_to_request",
    "__version__",
]
