"""Gap-based sessionization: one user-key shuffle, bounded state."""
from basis_devkit_spark import *


@node
def sessions(
    events=InputTable,
    out=OutputTable,
    gap_minutes=Parameter(type="int", default=30),
):
    from basis_devkit_spark.operators.events import session_stats

    out.replace(
        session_stats(events.read_dataframe(), gap_minutes=int(gap_minutes))
    )
