from basis_devkit_spark.engine.engine import Engine

__all__ = ["Engine"]
