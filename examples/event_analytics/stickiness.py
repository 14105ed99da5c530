"""Per-day DAU/WAU engagement stickiness (the standard product-health
ratio): events compact to the distinct (day, user) activity relation
first, so everything downstream is activity-sized, not event-sized."""
from basis_devkit_spark import *


@node
def stickiness(
    events=InputTable,
    out=OutputTable,
    window_days=Parameter(type="int", default=7),
):
    from basis_devkit_spark.operators.events import dau_wau_stickiness

    out.replace(
        dau_wau_stickiness(
            events.read_dataframe(), window_days=int(window_days)
        )
    )
