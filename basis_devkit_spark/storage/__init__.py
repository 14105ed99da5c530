from basis_devkit_spark.storage.store import TableStore, TableVersionInfo
from basis_devkit_spark.storage.state import StateStore

__all__ = ["TableStore", "TableVersionInfo", "StateStore"]
