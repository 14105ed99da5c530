"""Checkpoint block lifecycle helpers.

``DataFrame.unpersist()`` resolves through the SQL cache manager and is a
silent NO-OP on a ``localCheckpoint()``'ed frame: the blocks belong to
the internal checkpointed RDD, which the cache manager never sees
(verified on Spark 4.1 — ``getRDDStorageInfo`` still lists every block
after ``unpersist()``). The only runtime release path is unpersisting
the ``LogicalRDD``'s backing RDD. Python GC + the JVM ContextCleaner do
that eventually once the Dataset becomes unreachable, but "eventually"
is not a memory-management strategy for iterative operators that
supersede a vocabulary-sized checkpoint every round — on a long-lived
session the pinned block sets accumulate faster than the cleaner runs.

This matters at 100 TB exactly as much as locally: executor storage
memory pinned by dead checkpoints is storage memory unavailable to
shuffles and live caches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["release_plan_blocks"]


def release_plan_blocks(df: DataFrame) -> None:
    """Release the storage blocks behind ``df``, whether it was
    ``persist()``'ed (cache-manager path) or ``localCheckpoint()``'ed
    (backing-RDD path — the path ``DataFrame.unpersist()`` silently
    misses).

    The frame is UNUSABLE afterwards when it was a checkpoint (lineage
    was truncated; the blocks were the only copy) — only call on
    superseded or fully-consumed frames, never on one still referenced
    downstream.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
            return
    except Exception:
        # non-classic DataFrame impls / plan shapes: fall through to the
        # cache-manager path, which is at worst a no-op
        pass
    df.unpersist()
