-- TPC-H Q1-style aggregate (SURVEY §7.1 minimum slice)
select
    l_returnflag,
    l_linestatus,
    sum(l_quantity) as sum_qty,
    sum(l_extendedprice) as sum_base_price,
    sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
    avg(l_quantity) as avg_qty,
    count(*) as count_order
from {{ lineitem }}
where l_shipdate <= {{ cutoff }}
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
