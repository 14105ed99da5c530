"""SCD2 merge: expire updated keys' current rows at the update's
effective time; insert updates as the new current rows."""
from basis_devkit_spark import *


@node
def maintain_dim(dim=InputTable, updates=InputTable, out=OutputTable):
    from basis_devkit_spark.operators.joins import scd2_merge

    out.replace(
        scd2_merge(
            dim.read_dataframe(), updates.read_dataframe(),
            keys=["c_custkey"], effective_ts="effective_ts",
        )
    )
