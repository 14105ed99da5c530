"""As-of and range/interval joins — operators the delegated SQL surface
implies but Spark lacks as primitives (SURVEY §2.B B18/B19).

Both avoid the naive broadcast-nested-loop blowup:

- ``as_of_join``: union + single window pass ("union trick") — O(n log n)
  per key partition, one shuffle on the key, no non-equi join at all.
  Scales to arbitrarily large both-sides (the classic alternative,
  non-equi join + filter, degenerates to NLJ at 100 TB).
- ``range_join``: time-bucketized equi-join — each side is assigned to
  coarse buckets so Catalyst runs a shuffled hash/sort-merge join on
  (key, bucket), then the precise range predicate filters locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward; 'forward' = earliest >=).

    Union-trick implementation: tag sides, union on a common schema, one
    window ordered by time carries the most recent right-side values onto
    left rows via ``last(..., ignorenulls=True)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort before left rows at equal ts (<= semantics)
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        raise ValueError(f"unknown direction {direction}")

    carried = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("__side") == 1)
        .drop("__side", "__ts", *[f"__v_{c}" for c in value_cols])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Interval/overlap join: pairs where
    ``left_ts + lower <= right_ts <= left_ts + upper`` and keys match.

    Bucketized: both sides get coarse time buckets of width = (upper -
    lower); each left row probes its bucket and the next, turning the
    range predicate into an equi-join + local filter. No nested-loop.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    width = F.unix_timestamp(F.to_timestamp(F.lit("1970-01-01 00:00:00")) + hi) - F.unix_timestamp(
        F.to_timestamp(F.lit("1970-01-01 00:00:00")) + lo
    )

    l_b = left.withColumn(
        "__lo", F.col(left_ts) + lo
    ).withColumn("__hi", F.col(left_ts) + hi)
    l_b = l_b.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("__lo") / width),
                F.floor(F.unix_timestamp("__hi") / width),
            )
        ),
    )
    r_b = right.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(right_ts)) / width)
    )
    joined = l_b.join(r_b, keys + ["__bucket"], how).filter(
        (F.col(right_ts) >= F.col("__lo")) & (F.col(right_ts) <= F.col("__hi"))
    )
    return joined.drop("__bucket", "__lo", "__hi")


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: for every incoming update
    row, EXPIRE the key's current dimension row (``valid_to`` := the
    update's ``effective_ts``, ``is_current`` := false) and INSERT the
    update as the new current row (open-ended ``valid_to``). Unchanged
    keys and already-expired history pass through untouched.

    ``dim`` must carry the three SCD columns; ``updates`` carries the
    natural key + attributes + ``effective_ts``. One shuffle on the key
    (updates are broadcast when small); at scale this is the standard
    warehouse dimension-maintenance plan. Value-identical updates still
    open a new interval — version on every delivery; dedupe upstream if
    idempotent replays must not create intervals.

    A batch carrying MULTIPLE updates for the same key is collapsed to
    the LATEST ``effective_ts`` per key before merging (the standard
    Delta/warehouse latest-wins merge): otherwise the current row would
    expire once per update and every update would insert as current,
    corrupting the dimension. Exact ``effective_ts`` ties are broken
    deterministically by the remaining update columns, descending.
    """
    # latest-wins collapse of intra-batch multi-updates per key
    other = [c for c in updates.columns if c not in [*keys, effective_ts]]
    wu = Window.partitionBy(*keys).orderBy(
        F.col(effective_ts).desc(), *[F.col(c).desc() for c in other]
    )
    updates = (
        updates.withColumn("__scd_rn", F.row_number().over(wu))
        .filter(F.col("__scd_rn") == 1)
        .drop("__scd_rn")
    )
    upd_keyed = updates.select(
        *[F.col(k).alias(f"__uk_{k}") for k in keys],
        F.col(effective_ts).alias("__eff"),
    )
    cond = None
    for k in keys:
        e = F.col(k).eqNullSafe(F.col(f"__uk_{k}"))
        cond = e if cond is None else (cond & e)
    hit = cond & F.col(current_flag)
    expired = (
        dim.join(F.broadcast(upd_keyed), hit, "inner")
        .select(
            *[F.col(c) for c in dim.columns if c not in (valid_to, current_flag)],
            F.col("__eff").alias(valid_to),
            F.lit(False).alias(current_flag),
        )
    )
    untouched = dim.join(F.broadcast(upd_keyed), hit, "left_anti")
    inserts = updates.select(
        *[F.col(c) for c in updates.columns if c != effective_ts],
        F.col(effective_ts).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    return untouched.unionByName(expired).unionByName(
        inserts, allowMissingColumns=True
    )
