select o.o_orderkey, o.o_orderdate, d.c_acctbal as acctbal_at_order_time
from {{ orders }} o
join {{ dim }} d
  on o.o_custkey = d.c_custkey
 and o.o_orderdate >= d.valid_from
 and (d.valid_to is null or o.o_orderdate < d.valid_to)
