"""Per-user hourly rate anomalies vs the strictly-preceding baseline."""
from basis_devkit_spark import *


@node
def anomalies(events=InputTable, out=OutputTable):
    from basis_devkit_spark.operators.timeseries import zscore_anomalies

    out.replace(zscore_anomalies(events.read_dataframe(), threshold=2.5))
