"""Stage 5b — domain selection (DSIR): keep the slice of the curated
corpus whose hashed n-gram distribution most resembles a small
high-quality TARGET set ("make CommonCrawl look like Wikipedia" — Xie
et al. 2023). The weight fit is a bounded driver-side artifact; scoring
is one scan + broadcast join + exact integer sums."""
from basis_devkit_spark import *


@node
def select(
    docs=InputTable,
    target=InputTable,
    out=OutputTable,
    keep_fraction=Parameter(type="float", default=0.5),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.dsir import dsir_pipeline

    kf = min(max(float(keep_fraction), 0.0), 1.0)
    df = docs.read_dataframe()
    # persist: count() and the top-k join below both consume the scored
    # frame, and the DSIR pipeline is two corpus scans + a driver fit —
    # don't run it twice
    scored = dsir_pipeline(df, target.read_dataframe(), "text", "doc_id").persist()
    n_keep = int(scored.count() * kf)
    # deterministic top-fraction by (score desc, doc_id) — a bounded
    # TakeOrdered, no window
    top = (
        scored.orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(n_keep)
        .select("doc_id", "dsir_score")
    )
    out.replace(df.join(top, "doc_id"))
    scored.unpersist()
