"""Skew mitigation (SURVEY §4.3 "100 TB posture"): salting for hot keys.

AQE's skew-join splitting handles most cases automatically (enabled in
session defaults); these explicit operators are for the cases AQE can't
re-plan — skewed *aggregations* (one reducer owns the hot key) and joins
where the skewed side must stay un-broadcast.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    (keys, random salt) — spreading a hot key over ``salt`` reducers —
    then final aggregate on keys.

    ``aggs``: column → 'sum' | 'count' | 'min' | 'max' (decomposable
    aggregates only; avg = sum/count composed by the caller).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        pname = f"__p_{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(pname))
            final_exprs.append(F.sum(pname).alias(f"count_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(pname))
            final_exprs.append(F.sum(pname).alias(f"sum_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(pname))
            final_exprs.append(F.min(pname).alias(f"min_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(pname))
            final_exprs.append(F.max(pname).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = df_group = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (large, skewed) left side gets a random
    salt; the (smaller) right side is replicated ``salt`` times with every
    salt value — the hot key's rows then land on ``salt`` different
    reducers instead of one.

    Cost model: right side is duplicated ``salt``× (choose the smaller
    side as ``right``); left is read once. Prefer AQE skew-join or a
    broadcast when applicable; this is the fallback for huge⋈large with a
    hot key.

    Only inner/left joins are supported: replicating the right side would
    emit each unmatched right row ``salt`` times under right/full outer,
    and break semi/anti semantics.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how in ('inner','left','left_outer'), got {how!r}: "
            "right-side replication breaks outer/semi/anti semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l_s = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_s.join(r_s, keys + ["__salt"], how)
    return out.drop("__salt")
