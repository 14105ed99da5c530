"""Stage 2 — near-duplicate removal: exact dedup first (cheap hash
collapse of byte-identical docs), then MinHash-LSH keep-one. When the
upstream stage scored quality, each near-dup pair keeps the BEST copy
(keep_by) instead of the min-id copy — the production keeper rule."""
from basis_devkit_spark import *


@node
def dedup(
    docs=InputTable,
    out=OutputTable,
    jaccard_threshold=Parameter(type="float", default=0.7),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.dedup import exact_dedup, minhash_dedup

    df = docs.read_dataframe()
    exact = exact_dedup(
        df.withColumn("__h", F.md5("text")), ["__h"], order_by="doc_id"
    ).drop("__h")
    keep = "quality_score" if "quality_score" in df.columns else None
    out.replace(
        minhash_dedup(
            exact, "doc_id", "text",
            jaccard_threshold=float(jaccard_threshold),
            keep_by=keep,
        )
    )
