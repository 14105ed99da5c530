"""Stage 3 — benchmark decontamination: drop any doc sharing a word
5-gram with the eval set. The benchmark gram set is distinct'd then
broadcast — the corpus never self-joins."""
from basis_devkit_spark import *


@node
def decontaminate(docs=InputTable, benchmark=InputTable, out=OutputTable):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.dedup import ngram_contamination

    df = docs.read_dataframe()
    contaminated = ngram_contamination(
        df, benchmark.read_dataframe(), shingle_size=5
    ).select(F.col("doc_id").alias("__bad"))
    out.replace(
        df.join(contaminated, F.col("doc_id") == F.col("__bad"), "left_anti")
    )
