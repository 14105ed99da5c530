"""Strict-order conversion funnel with a 24h bounded window."""
from basis_devkit_spark import *


@node
def funnel(events=InputTable, out=OutputTable):
    from basis_devkit_spark.operators.events import funnel as funnel_op

    out.replace(
        funnel_op(
            events.read_dataframe(),
            ["view", "click", "purchase"],
            within_minutes=1440,
        )
    )
