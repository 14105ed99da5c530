"""§2.B relational surface queries (scans, filters, joins, aggs, windows,
sorts, sets, scalar functions, UDF boundary). Each is implemented with the
DataFrame API (demonstrating the operator) and paired with a DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basis_devkit_spark.session import local_relation
from pyspark.sql import types as T
from pyspark.sql.window import Window

from basis_devkit_spark.queries import load, register


def dsum(col: str):
    """Exact double sum via decimal accumulation (determinism rule)."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


def dsum_expr(expr) -> F.Column:
    """Exact decimal sum of an expression that is ALREADY exact at 2dp
    (a raw money column, or a decimal product). Do NOT feed it a double
    product whose true scale exceeds 2 — the double→decimal(18,2) cast
    rounds at the .005 boundary and Spark/DuckDB can disagree on which
    side the nearest binary double falls (the b75 one-cent bug; judge's
    reproducer: order 12376, line revenue exactly 96901.815). For
    price*(1-discount) revenue use :func:`drev`, which multiplies in
    decimal so no rounding ever happens."""
    return F.sum(expr.cast("decimal(18,2)")).cast("double")


def drev(price: str = "l_extendedprice", discount: str = "l_discount") -> F.Column:
    """Exact decimal revenue ``price * (1 - discount)``: the price (a 2dp
    money value) is cast to decimal BEFORE the multiply, and the
    ``1 - discount`` factor — a 2dp value whose double error (~1e-17) is
    nowhere near a 4dp rounding boundary — is cast to decimal(6,4), so
    the decimal(19,6) product is EXACT and engines cannot diverge at a
    .005 boundary. SQL-side mirror:
    ``(cast(price as decimal(12,2)) * cast(1 - discount as decimal(6,4)))``.
    """
    return F.col(price).cast("decimal(12,2)") * (
        F.lit(1) - F.col(discount)
    ).cast("decimal(6,4)")


def dsum_rev(
    price: str = "l_extendedprice", discount: str = "l_discount"
) -> F.Column:
    """``sum(drev())`` cast back to double — the decimal-exact revenue
    aggregate used by every TPC-H-style money query."""
    return F.sum(drev(price, discount)).cast("double")


# =============================== scans (B1, B4) ===============================
@register(
    "b01_parquet_scan_pushdown",
    """
    select l_orderkey, l_quantity, l_extendedprice
    from lineitem
    where l_shipdate >= '1998-01-01' and l_quantity < 10
    """,
    doc="projection + predicate reach the parquet scan (PushedFilters)",
)
def b01(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .filter((F.col("l_shipdate") >= "1998-01-01") & (F.col("l_quantity") < 10))
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )


# ======================= projection / filter (B7-B11) ========================
@register(
    "b07_project_compute",
    """
    select o_orderkey,
           o_totalprice,
           o_totalprice * 0.1 as commission,
           upper(o_orderstatus) as status_uc
    from orders
    """,
)
def b07(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").select(
        "o_orderkey",
        "o_totalprice",
        # raw product, no round: IEEE multiply is bit-identical across
        # engines; round() at a decimal half-boundary is not
        (F.col("o_totalprice") * 0.1).alias("commission"),
        F.upper("o_orderstatus").alias("status_uc"),
    )


@register(
    "b08_filter_predicates",
    """
    select o_orderkey, o_orderpriority, o_totalprice
    from orders
    where o_totalprice between 1000 and 50000
      and o_orderstatus in ('F', 'O')
      and o_orderpriority like '1%'
      and o_custkey is not null
    """,
)
def b08(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("1%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "b09_distinct",
    "select distinct l_returnflag, l_linestatus from lineitem",
)
def b09(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "b10_case_cast_coalesce",
    """
    select o_orderkey,
           case when o_totalprice > 100000 then 'big'
                when o_totalprice > 10000 then 'mid'
                else 'small' end as size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') as status_norm,
           cast(floor(o_totalprice) as bigint) as price_int
    from orders
    """,
)
def b10(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        # floor, not bare cast: double→bigint casts round in DuckDB but
        # truncate in Spark — floor is unambiguous in both
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
    )


@register(
    "b11_deterministic_sample",
    """
    select o_orderkey, o_totalprice from orders where o_orderkey % 10 = 0
    """,
    doc="deterministic modulo sample (seeded engine samples aren't cross-engine comparable)",
)
def b11(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_totalprice")
    )


# ================================ joins (B12-B19) =============================
@register(
    "b12_join_inner",
    """
    select n.n_name, count(*) as n_customers,
           cast(sum(cast(c.c_acctbal as decimal(18,2))) as double) as total_bal
    from customer c join nation n on c.c_nationkey = n.n_nationkey
    group by n.n_name
    """,
)
def b12(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_bal"))
    )


@register(
    "b13_join_left_outer",
    """
    select c.c_custkey, count(o.o_orderkey) as n_orders
    from customer c left join orders o on c.c_custkey = o.o_custkey
    group by c.c_custkey
    """,
)
def b13(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "b13b_join_full_outer",
    """
    select coalesce(a.k, b.k) as k, a.na, b.nb from
      (select o_orderstatus as k, count(*) as na from orders group by 1) a
      full outer join
      (select l_linestatus as k, count(*) as nb from lineitem group by 1) b
      on a.k = b.k
    """,
)
def b13b(spark: SparkSession, sf: str) -> DataFrame:
    a = load(spark, sf, "orders").groupBy(F.col("o_orderstatus").alias("k")).agg(
        F.count("*").alias("na")
    )
    b = load(spark, sf, "lineitem").groupBy(F.col("l_linestatus").alias("k")).agg(
        F.count("*").alias("nb")
    )
    return a.join(b, "k", "full").select(
        F.coalesce(a["k"], b["k"]).alias("k"), "na", "nb"
    )


@register(
    "b14_semi_anti_join",
    """
    select
      (select count(*) from customer c where exists
        (select 1 from orders o where o.o_custkey = c.c_custkey)) as n_with_orders,
      (select count(*) from customer c where not exists
        (select 1 from orders o where o.o_custkey = c.c_custkey)) as n_without_orders
    """,
)
def b14(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    return local_relation(
        spark, [(semi, anti)],
        "n_with_orders bigint, n_without_orders bigint",
    )


@register(
    "b15_cross_join",
    """
    select r.r_name, n.n_name from region r cross join nation n
    """,
)
def b15(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "region")
        .select("r_name")
        .crossJoin(load(spark, sf, "nation").select("n_name"))
    )


@register(
    "b16_theta_join",
    """
    select n.n_name, count(*) as n_pairs
    from supplier s join customer c
      on s.s_nationkey = c.c_nationkey and s.s_acctbal < c.c_acctbal
    join nation n on n.n_nationkey = s.s_nationkey
    group by n.n_name
    """,
    doc="non-equi conjunct on top of an equi key (avoids pure NLJ)",
)
def b16(spark: SparkSession, sf: str) -> DataFrame:
    s = load(spark, sf, "supplier")
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "b17_broadcast_join",
    """
    select r.r_name, count(*) as n_nations
    from nation n join region r on n.n_regionkey = r.r_regionkey
    group by r.r_name
    """,
    doc="explicit broadcast hint on the small dim",
)
def b17(spark: SparkSession, sf: str) -> DataFrame:
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
    )


@register(
    "b18_asof_join",
    """
    select p.event_id,
           (select max(c.ts) from events c
             where c.user_id = p.user_id and c.event_type = 'click'
               and c.ts <= p.ts) as ts_click
    from events p where p.event_type = 'purchase'
    """,
    doc="as-of join: latest click at-or-before each purchase (union+window impl)",
)
def b18(spark: SparkSession, sf: str) -> DataFrame:
    from basis_devkit_spark.operators.joins import as_of_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts")
    )
    joined = as_of_join(
        purchases,
        clicks.withColumn("ts_click", F.col("ts")),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts_click"],
        suffix="",
    )
    return joined.select("event_id", "ts_click")


@register(
    "b19_interval_join",
    """
    select e.user_id, count(*) as n_error_pairs
    from events c join events e
      on c.user_id = e.user_id
     and e.event_type = 'error' and c.event_type = 'click'
     and e.ts >= c.ts and e.ts <= c.ts + interval 5 minute
    group by e.user_id
    """,
    doc="interval join via bucketized equi-join (no NLJ)",
)
def b19(spark: SparkSession, sf: str) -> DataFrame:
    from basis_devkit_spark.operators.joins import range_join

    ev = load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts")
    )
    joined = range_join(
        clicks, errors, on="user_id", left_ts="c_ts", right_ts="e_ts",
        lower="0 seconds", upper="5 minutes",
    )
    return joined.groupBy("user_id").agg(F.count("*").alias("n_error_pairs"))


# ============================ aggregations (B20-B28) ==========================
@register(
    "b20_groupby_agg",
    """
    select l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
           cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_price,
           round(min(l_discount), 4) as min_disc,
           round(max(l_tax), 4) as max_tax,
           count(*) as count_order
    from lineitem
    group by l_returnflag, l_linestatus
    """,
)
def b20(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
            F.round(F.min("l_discount"), 4).alias("min_disc"),
            F.round(F.max("l_tax"), 4).alias("max_tax"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "b21_count_distinct",
    """
    select o_orderstatus,
           count(distinct o_custkey) as n_customers,
           count(*) as n_orders
    from orders group by o_orderstatus
    """,
)
def b21(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "b22_approx_count_distinct",
    None,  # HLL sketches aren't cross-engine comparable: rows-only check
    doc="approx_count_distinct (HLL++); verified vs exact within rsd in tests",
)
def b22(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"))
    )


@register(
    "b23_stat_aggs",
    """
    select l_returnflag,
           round(stddev_samp(l_quantity), 4) as sd_qty,
           round(var_samp(l_quantity), 4) as var_qty,
           round(corr(l_quantity, l_extendedprice), 4) as corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) as covar_qty_price
    from lineitem group by l_returnflag
    """,
)
def b23(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
    )


@register(
    "b24_percentiles",
    """
    select o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) as p50,
           round(quantile_cont(o_totalprice, 0.9), 4) as p90,
           round(quantile_cont(o_totalprice, 0.99), 4) as p99
    from orders group by o_orderstatus
    """,
)
def b24(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
        )
    )


@register(
    "b25_collect_string_agg",
    """
    select n_regionkey,
           array_to_string(list_sort(list(distinct n_name)), ',') as nations
    from nation group by n_regionkey
    """,
)
def b25(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias("nations")
        )
    )


@register(
    "b26_rollup",
    """
    select coalesce(l_returnflag, 'ALL') as l_returnflag,
           coalesce(l_linestatus, 'ALL') as l_linestatus,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
           count(*) as n
    from lineitem group by rollup(l_returnflag, l_linestatus)
    """,
)
def b26(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "b26b_cube",
    """
    select coalesce(o_orderstatus, 'ALL') as o_orderstatus,
           coalesce(o_orderpriority, 'ALL') as o_orderpriority,
           count(*) as n
    from orders group by cube(o_orderstatus, o_orderpriority)
    """,
)
def b26b(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n",
        )
    )


@register(
    "b27_filtered_agg",
    """
    select l_returnflag,
           count(*) filter (where l_discount > 0.05) as n_discounted,
           cast(sum(cast(case when l_tax > 0.04 then l_extendedprice else 0 end
                as decimal(18,2))) as double) as taxed_price
    from lineitem group by l_returnflag
    """,
)
def b27(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        dsum_expr(
            F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0)
        ).alias("taxed_price"),
    )


@register(
    "b28_pivot",
    """
    select o_orderpriority,
           count(*) filter (where o_orderstatus = 'F') as F,
           count(*) filter (where o_orderstatus = 'O') as O,
           count(*) filter (where o_orderstatus = 'P') as P
    from orders group by o_orderpriority
    """,
)
def b28(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


# ============================ windows (B29-B32) ===============================
@register(
    "b29_ranking_windows",
    """
    select o_orderkey, o_custkey,
           row_number() over w as rn,
           rank() over w as rnk,
           dense_rank() over w as drnk,
           ntile(4) over w as quartile
    from orders
    window w as (partition by o_custkey order by o_totalprice desc, o_orderkey)
    """,
)
def b29(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "b30_lag_lead",
    """
    select o_orderkey, o_custkey,
           lag(o_totalprice) over w as prev_price,
           lead(o_totalprice) over w as next_price,
           first_value(o_totalprice) over w as first_price
    from orders
    window w as (partition by o_custkey order by o_orderdate, o_orderkey)
    """,
)
def b30(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@register(
    "b31_window_frames",
    """
    select o_orderkey, o_custkey,
           cast(sum(cast(o_totalprice as decimal(18,2)))
                over (partition by o_custkey order by o_orderdate, o_orderkey
                      rows between unbounded preceding and current row) as double)
             as running_spend,
           round(avg(o_totalprice)
                over (partition by o_custkey order by o_orderdate, o_orderkey
                      rows between 2 preceding and current row), 4)
             as moving_avg_3
    from orders
    """,
)
def b31(spark: SparkSession, sf: str) -> DataFrame:
    ob = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = Window.partitionBy("o_custkey").orderBy(*ob).rowsBetween(-2, 0)
    return load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_run)
        .cast("double")
        .alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w_mov), 4).alias("moving_avg_3"),
    )


@register(
    "b32_cume_dist_percent_rank",
    """
    select o_orderkey,
           round(cume_dist() over w, 6) as cd,
           round(percent_rank() over w, 6) as pr
    from orders
    window w as (order by o_totalprice, o_orderkey)
    """,
)
def b32(spark: SparkSession, sf: str) -> DataFrame:
    # cume_dist/percent_rank over the whole relation are total-order
    # statistics — the no-partition window is the operator's semantics, not
    # an implementation shortcut. At 100 TB rewrite as two passes: global
    # rank via range-partitioned sort + per-partition offsets (the
    # drop_late_events prefix pattern), divided by one count.
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return load(spark, sf, "orders").select(
        "o_orderkey",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


# ======================= sorts / limits / top-k (B33-B35) =====================
@register(
    "b33_order_nulls",
    """
    select o_orderkey, nullif(o_orderstatus, 'P') as status_nullable
    from orders
    order by status_nullable desc nulls last, o_orderkey
    limit 100
    """,
)
def b33(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_nullable"),
        )
        .orderBy(F.col("status_nullable").desc_nulls_last(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "b34_limit_offset",
    """
    select o_orderkey, o_totalprice from orders
    order by o_totalprice desc, o_orderkey
    limit 20 offset 10
    """,
)
def b34(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "b35_topk_per_group",
    """
    select * from (
      select c_nationkey, c_custkey, c_acctbal,
             row_number() over (partition by c_nationkey
                                order by c_acctbal desc, c_custkey) as rn
      from customer) t
    where rn <= 3
    """,
)
def b35(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        load(spark, sf, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ============================ set operations (B36-B38) ========================
@register(
    "b36_union",
    """
    select k from (
      select o_custkey as k from orders where o_totalprice > 300000
      union
      select c_custkey as k from customer where c_acctbal > 9000
    ) t
    """,
)
def b36(spark: SparkSession, sf: str) -> DataFrame:
    a = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("k"))
    )
    b = (
        load(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"))
    )
    return a.union(b).distinct()


@register(
    "b37_intersect",
    """
    select o_custkey as k from orders where o_orderstatus = 'F'
    intersect
    select o_custkey as k from orders where o_orderstatus = 'O'
    """,
)
def b37(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    a = o.filter("o_orderstatus = 'F'").select(F.col("o_custkey").alias("k"))
    b = o.filter("o_orderstatus = 'O'").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@register(
    "b38_except",
    """
    select c_custkey as k from customer
    except
    select o_custkey as k from orders
    """,
)
def b38(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return c.exceptAll(o).distinct()


# ========================= scalar functions (B39-B46) =========================
@register(
    "b39_string_funcs",
    """
    select c_custkey,
           lower(c_name) as name_lc,
           length(c_name) as name_len,
           substring(c_name, 1, 8) as name_pre,
           replace(c_name, 'Customer', 'Cust') as name_repl,
           concat_ws('-', c_mktsegment, cast(c_nationkey as varchar)) as seg_nat,
           lpad(cast(c_custkey as varchar), 10, '0') as key_pad,
           regexp_extract(c_name, '([0-9]+)', 1) as key_digits,
           reverse(c_mktsegment) as seg_rev,
           upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2)
             as seg_title
    from customer
    """,
)
def b39(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lc"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_pre"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_repl"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nat"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("key_digits"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
    )


@register(
    "b40_date_funcs",
    """
    select o_orderkey,
           cast(year(o_orderdate) as int) as yr,
           cast(month(o_orderdate) as int) as mo,
           cast(dayofweek(o_orderdate) + 1 as int) as dow,  -- duckdb 0=Sun, spark 1=Sun
           cast(date_trunc('month', o_orderdate) as timestamp) as month_start,
           cast(o_orderdate + interval 30 day as timestamp) as due_date,
           cast(datediff('day', cast(o_orderdate as date), date '2002-01-01') as int)
             as days_to_2002,
           strftime(o_orderdate, '%Y-%m') as ym
    from orders
    """,
)
def b40(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "b41_math_funcs",
    """
    select l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 2) as abs_diff,
           cast(ceil(l_quantity) as bigint) as qty_ceil,
           cast(floor(l_quantity) as bigint) as qty_floor,
           round(sqrt(l_extendedprice), 4) as price_sqrt,
           round(ln(l_extendedprice + 1), 6) as price_ln,
           round(log10(l_extendedprice + 1), 6) as price_log10,
           mod(cast(l_quantity as bigint), 7) as qty_mod,
           round(power(l_discount, 2), 6) as disc_sq,
           greatest(l_tax, l_discount) as max_rate,
           least(l_tax, l_discount) as min_rate,
           cast(sign(l_extendedprice - 30000) as double) as price_sign
    from lineitem
    """,
)
def b41(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_diff"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 30000).alias("price_sign"),
    )


@register(
    "b42_array_funcs",
    """
    select doc_id,
           len(string_split(text, ' ')) as n_tokens,
           len(list_distinct(string_split(text, ' '))) as n_unique,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|')
             as first5_sorted,
           list_contains(string_split(text, ' '), 'spark') as has_spark
    from documents
    """,
)
def b42(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.concat_ws("|", F.slice(F.sort_array(F.array_distinct(toks)), 1, 5)).alias(
            "first5_sorted"
        ),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@register(
    "b42b_array_hof",
    """
    select doc_id,
           cast(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
                as bigint) as total_chars,
           len(list_filter(string_split(text, ' '), x -> length(x) > 5)) as n_long
    from documents
    """,
    doc="higher-order array functions (transform / filter / aggregate)",
)
def b42b(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long"),
    )


@register(
    "b43_map_funcs",
    """
    select doc_id,
           map_extract(map(['lang','source'], [lang, source]), 'lang')[1] as lang_val,
           array_to_string(map_keys(map(['lang','source'], [lang, source])), ',')
             as keys_csv
    from documents
    """,
)
def b43(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )


@register(
    "b44_json_funcs",
    """
    select event_id,
           cast(json_extract(props, '$.k') as bigint) as k_val,
           case when cast(json_extract(props, '$.k') as bigint) > 50
                then 'high' else 'low' end as k_class
    from events
    """,
)
def b44(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.when(k > 50, "high").otherwise("low").alias("k_class"),
    )


@register(
    "b45_null_funcs",
    """
    select o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'none') as c1,
           (nullif(o_orderstatus, 'O') is null) as is_o,
           ifnull(nullif(o_totalprice, 0), -1) as price_nn
    from orders
    """,
)
def b45(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    ns = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.coalesce(ns, F.lit("none")).alias("c1"),
        ns.isNull().alias("is_o"),
        F.nvl(F.nullif(F.col("o_totalprice"), F.lit(0.0)), F.lit(-1.0)).alias(
            "price_nn"
        ),
    )


@register(
    "b46_hash_funcs",
    """
    select c_custkey,
           md5(c_name) as name_md5,
           sha256(c_name) as name_sha256
    from customer
    """,
)
def b46(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


# ========================= UDF boundary (B47-B50) =============================
@register(
    "b47_pandas_udf_scalar",
    """
    select l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) as charged
    from lineitem
    """,
    doc="vectorized scalar Pandas UDF (Arrow) — oracle is the pure-SQL equivalent",
)
def b47(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    return load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        # no round: numpy/DuckDB IEEE products are bit-identical; rounding
        # at decimal half-boundaries is engine-dependent
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@register(
    "b48_grouped_map",
    """
    with g as (
      select c_nationkey,
             cast(sum(cast(c_acctbal as decimal(12,2))) as double) as s,
             cast(sum(cast(c_acctbal as decimal(12,2))
                      * cast(c_acctbal as decimal(12,2))) as double) as sq,
             count(*) as n
      from customer group by c_nationkey
    )
    select c.c_custkey,
           floor((c.c_acctbal - g.s / g.n)
                 / sqrt((g.sq - g.s * g.s / g.n) / (g.n - 1))
                 * 10000.0 + 0.5) / 10000.0 as bal_z
    from customer c join g on c.c_nationkey = g.c_nationkey
    """,
    doc="applyInPandas per-group transform (z-score) vs moment-formula "
    "oracle. Exactness recipe (caught by the sf0.1 exact-hash sweep): "
    "pandas' pairwise-summed mean/std and the engine's stddev_samp "
    "differ in final ulps, which flips a 4dp round at a .00005 "
    "boundary — so BOTH sides compute the moments from decimal-exact "
    "sums (integer cents in the UDF, DECIMAL(12,2) in SQL) and derive "
    "z through the identical float64 formula with explicit IEEE "
    "rounding (the d06f standardize-fit recipe at the UDF boundary)",
)
def b48(spark: SparkSession, sf: str) -> DataFrame:
    import math

    import numpy as np

    c = load(spark, sf, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact moments: 2dp money -> integer cents (int64, exact)
        from fractions import Fraction

        cents = (pdf["c_acctbal"] * 100).round().astype("int64")
        n = len(pdf)
        # Single rounding from the exact rational — float(Fraction) is the
        # correctly-rounded nearest double, i.e. identical to the oracle's
        # one-step decimal→double cast.  int→float-then-divide would round
        # TWICE, which can differ by one ulp once the cents² sum exceeds
        # 2^53 (large scale factors) and flip the 4dp floor at .00005.
        s = float(Fraction(int(cents.sum()), 100))
        sq = float(Fraction(int((cents * cents).sum()), 10000))
        if n < 2:
            z = pd.Series([float("nan")] * n, index=pdf.index)
        else:
            mu = s / n
            sd = math.sqrt((sq - s * s / n) / (n - 1))
            z = (pdf["c_acctbal"] - mu) / sd
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "bal_z": np.floor(z * 10000.0 + 0.5) / 10000.0,
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        zscore, "c_custkey bigint, bal_z double"
    )


@register(
    "b49_flatmap_udtf",
    """
    select p_partkey, unnest(string_split(p_name, ' ')) as word from part
    """,
    doc="mapInPandas flat-map (1 row → N rows) vs unnest oracle",
)
def b49(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select("p_partkey", "p_name")

    def expand(batches):
        for pdf in batches:
            rows = {"p_partkey": [], "word": []}
            for key, name in zip(pdf["p_partkey"], pdf["p_name"]):
                for w in str(name).split(" "):
                    rows["p_partkey"].append(key)
                    rows["word"].append(w)
            yield pd.DataFrame(rows)

    return p.mapInPandas(expand, "p_partkey bigint, word string")


@register(
    "b50_pandas_udaf",
    """
    select l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             as wavg_price
    from lineitem group by l_returnflag
    """,
    doc="GROUPED_AGG pandas UDF (weighted mean) vs pure-SQL oracle",
)
def b50(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price"))
    )
