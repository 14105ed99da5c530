"""Corpus Zipf rank-frequency fit: slope near -1 = natural text;
shallow = boilerplate floods the head; steep = mode collapse."""
from basis_devkit_spark import *


@node
def zipf(docs=InputTable, out=OutputTable):
    from basis_devkit_spark.operators.text import zipf_fit

    out.replace(zipf_fit(docs.read_dataframe(), "text", top_r=256))
