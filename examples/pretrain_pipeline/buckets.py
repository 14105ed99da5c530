"""Stage 5 — perplexity curation: corpus-fit bigram-LM buckets (CCNet
head/middle/tail over the docs that SURVIVED the earlier gates); keep
the configured bucket labels, dropping the noisiest slice. The rank is
the value-bucketed two-phase prefix — no single-reducer window."""
from basis_devkit_spark import *


@node
def buckets(
    docs=InputTable,
    out=OutputTable,
    keep=Parameter(type="string", default="head,middle"),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.text import lm_quality_buckets

    df = docs.read_dataframe()
    keep_labels = [s.strip() for s in str(keep).split(",") if s.strip()]
    lb = lm_quality_buckets(df, "doc_id", "text").filter(
        F.col("label").isin(keep_labels)
    )
    out.replace(
        df.join(lb.select("doc_id", "lm_score", "label"), "doc_id")
    )
