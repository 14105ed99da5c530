"""Portable table export / import — interop with other engines.

The managed-table manifest (``store.py::_Manifest``) is proprietary to this
engine; an adopter needs a way in and a way out that any parquet reader
understands. Export lays a table out as plain parquet plus one small JSON
descriptor (schema, row count, table config, version list) — DuckDB,
Spark, pandas, Trino etc. read ``data/`` directly with zero knowledge of
this engine. Import ingests either such an export (restoring table config
and, optionally, version history) or any raw parquet/csv/jsonl path.

Layout::

    dest/
      table.json          # descriptor (see export_table)
      data/*.parquet      # active version, plain parquet
      versions/v=N/       # retained versions (only with include_history)

At scale the export is one distributed write per exported version (no
driver materialization); import is one read + one managed write per
version — both O(data) single passes.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame

from basis_devkit_spark.storage.store import TableStore

DESCRIPTOR = "table.json"
FORMAT_VERSION = 1


def export_table(
    store: TableStore, dest: str, include_history: bool = False
) -> dict[str, Any]:
    """Export ``store`` to ``dest``; returns the written descriptor."""
    if not store.exists:
        raise FileNotFoundError(f"table '{store.name}' has no active version")
    os.makedirs(dest, exist_ok=True)
    df = store.read()
    df.write.mode("overwrite").parquet(os.path.join(dest, "data"))

    m = store._manifest
    versions: list[dict[str, Any]] = []
    if include_history:
        for vs in sorted(m.versions, key=int):
            v = int(vs)
            try:
                vdf = store.read_version(v)
            except FileNotFoundError:  # vacuumed
                continue
            vdf.write.mode("overwrite").parquet(
                os.path.join(dest, "versions", f"v={v}")
            )
            versions.append(
                {
                    "version": v,
                    "record_count": m.versions[vs].get("record_count"),
                    "active": v == m.active_version,
                }
            )
    desc = {
        "format_version": FORMAT_VERSION,
        "name": store.name,
        "schema_json": df.schema.json(),
        "record_count": store.record_count,
        "active_version": m.active_version,
        "config": {
            "unique_on": m.unique_on,
            "partition_by": m.partition_by,
            "cluster_by": m.cluster_by,
            "stats_columns": m.stats_columns,
            "strictly_monotonic_ordering": m.strictly_monotonic_ordering,
            "created_ordering": m.created_ordering,
        },
        "versions": versions,
    }
    with open(os.path.join(dest, DESCRIPTOR), "w") as f:
        json.dump(desc, f, indent=2)
    return desc


def _read_raw(spark, src: str, fmt: str | None) -> DataFrame:
    if fmt is None:
        low = src.lower()
        if low.endswith((".csv",)):
            fmt = "csv"
        elif low.endswith((".json", ".jsonl")):
            fmt = "jsonl"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        return spark.read.parquet(src)
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(src)
    if fmt in ("json", "jsonl"):
        return spark.read.json(src)
    raise ValueError(f"unsupported import format {fmt!r}")


def import_table(
    store: TableStore,
    src: str,
    fmt: str | None = None,
    restore_history: bool = False,
) -> dict[str, Any]:
    """Import ``src`` into ``store`` as new version(s).

    - An export directory (has ``table.json``): restores table config onto
      a fresh store and writes the data; with ``restore_history`` each
      exported version is replayed oldest-first (time travel preserved,
      renumbered from the store's next version).
    - Anything else: one raw parquet/csv/jsonl read, one managed write.
    """
    spark = store.spark
    desc_path = os.path.join(src, DESCRIPTOR)
    if os.path.isfile(desc_path):
        with open(desc_path) as f:
            desc = json.load(f)
        cfg = desc.get("config") or {}
        if not store.exists:
            store.configure(
                unique_on=cfg.get("unique_on"),
                partition_by=cfg.get("partition_by"),
                cluster_by=cfg.get("cluster_by"),
                stats_columns=cfg.get("stats_columns"),
                strictly_monotonic_ordering=cfg.get("strictly_monotonic_ordering"),
                created_ordering=cfg.get("created_ordering"),
            )
        imported = 0
        if restore_history and desc.get("versions"):
            for vinfo in sorted(desc["versions"], key=lambda v: v["version"]):
                vdir = os.path.join(src, "versions", f"v={vinfo['version']}")
                store.write_replace(spark.read.parquet(vdir))
                imported += 1
        else:
            store.write_replace(spark.read.parquet(os.path.join(src, "data")))
            imported = 1
        return {
            "table": store.name,
            "source": src,
            "versions_imported": imported,
            "records": store.record_count,
        }
    df = _read_raw(spark, src, fmt)
    store.write_replace(df)
    return {
        "table": store.name,
        "source": src,
        "versions_imported": 1,
        "records": store.record_count,
    }
