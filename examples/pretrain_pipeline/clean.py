"""Stage 1 — quality gates: Gopher-style rules + heuristic quality floor
+ language ID, all fused into one scan (pure column expressions)."""
from basis_devkit_spark import *


@node
def clean(
    docs=InputTable,
    out=OutputTable,
    min_words=Parameter(type="int", default=20),
    min_quality=Parameter(type="float", default=0.5),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.text import filter_corpus, gopher_rules

    df = filter_corpus(
        docs.read_dataframe(),
        min_words=int(min_words),
        min_quality=float(min_quality),
    )
    flagged = gopher_rules(df, min_words=int(min_words), stopwords=["the", "a"])
    out.replace(
        flagged.filter(F.col("passes_gopher")).select(
            "doc_id", "text", "lang", "source", "n_words", "quality_score"
        )
    )
