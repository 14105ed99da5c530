from basis_devkit_spark.graph.spec import GraphSpec, NodeSpec, StoreSpec
from basis_devkit_spark.graph.loader import load_graph, find_graph_file, GraphValidationError

__all__ = [
    "GraphSpec",
    "NodeSpec",
    "StoreSpec",
    "load_graph",
    "find_graph_file",
    "GraphValidationError",
]
