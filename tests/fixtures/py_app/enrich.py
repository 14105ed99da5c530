# class-style SDK node (reference template: create.py:229-237)
from pyspark.sql import functions as F

from basis_devkit_spark import Parameter, State, Table

orders = Table("orders_in", "r")
big_orders = Table("big_orders", "w")
min_total = Parameter("min_total", type="float", default=50.0)
state = State()

df = orders.read_dataframe()
out = df.filter(F.col("o_totalprice") >= float(min_total.value))
big_orders.replace(out)
state.set_value("last_min_total", float(min_total.value))
