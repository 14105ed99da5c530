"""Per-source KL divergence from the corpus term distribution: a spike
means the slice speaks a vocabulary the rest of the corpus doesn't."""
from basis_devkit_spark import *


@node
def divergence(docs=InputTable, out=OutputTable):
    from basis_devkit_spark.operators.text import source_kl_divergence

    out.replace(source_kl_divergence(docs.read_dataframe()))
