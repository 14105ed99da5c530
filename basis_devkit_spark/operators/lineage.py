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

import logging

from pyspark.sql import DataFrame

__all__ = ["release_plan_blocks"]

_LOG = logging.getLogger(__name__)


def release_plan_blocks(df: DataFrame) -> None:
    """Release the storage blocks behind ``df``, whether it was
    ``persist()``'ed (cache-manager path) or ``localCheckpoint()``'ed
    (backing-RDD path — the path ``DataFrame.unpersist()`` silently
    misses), including a checkpointed frame WRAPPED in transformations
    (select/filter on top of the checkpoint): any ``LogicalRDD`` leaf
    of the analyzed plan is released, not just an exact-root match.

    Precedence: a frame the cache manager knows about (non-NONE
    ``storageLevel``) is released through ``unpersist()`` ONLY — its
    plan may contain a still-live checkpoint leaf shared with other
    frames (e.g. the pinned lineage root of an iterative loop), which
    must not be collaterally dropped. Checkpoint-leaf release runs only
    for frames the cache manager does not own.

    The frame is UNUSABLE afterwards when it was a checkpoint (lineage
    was truncated; the blocks were the only copy) — only call on
    superseded or fully-consumed frames, never on one still referenced
    downstream. When neither path applies the call degrades to the GC
    fallback; a debug log line makes that miss observable.
    """
    try:
        lvl = df.storageLevel
        if lvl.useMemory or lvl.useDisk:
            df.unpersist()
            return
    except Exception:
        pass
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        released = False
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getName().endswith("LogicalRDD"):
                leaf.rdd().unpersist(False)
                released = True
        if released:
            return
    except Exception:
        # non-classic DataFrame impls / plan shapes: fall through to the
        # cache-manager path, which is at worst a no-op
        pass
    _LOG.debug(
        "release_plan_blocks: no cache entry and no LogicalRDD leaf for "
        "this frame; falling back to DataFrame.unpersist() (a no-op for "
        "checkpointed frames — blocks will wait on GC + ContextCleaner)"
    )
    df.unpersist()
