"""Stage 1b — per-domain cap (RefinedWeb-style): cap the corpus at
``max_per_domain`` documents per REGISTRABLE domain (eTLD+1 under the
Public Suffix List) before any content-level stage, keeping the
best-quality copies — a single mega-host (link farm, mirror, one SEO
domain) must not dominate the downstream mix. Domain extraction is a
pure projection; the cap rides the bounded grouped reservoir (the hot
domain IS the skewed key — no window, no unbounded merge buffer)."""
from basis_devkit_spark import *


@node
def domains(
    docs=InputTable,
    out=OutputTable,
    max_per_domain=Parameter(type="int", default=3),
    url_col=Parameter(type="string", default="url"),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.domains import domain_cap

    df = docs.read_dataframe()
    if url_col not in df.columns:
        # the shipped fixtures carry no crawl URL: derive the d48-family
        # deterministic stand-in from (source, doc_id). Real deployments
        # read the crawl's own url column and this branch never runs.
        df = df.withColumn(
            url_col,
            F.concat(
                F.lit("https://w"),
                (F.col("doc_id") % 3).cast("string"),
                F.lit("."),
                F.lower("source"),
                F.element_at(
                    F.array(
                        F.lit(".com"), F.lit(".co.uk"), F.lit(".org"),
                        F.lit(".github.io"), F.lit(".net"),
                    ),
                    (F.col("doc_id") % 5 + 1).cast("int"),
                ),
                F.lit("/doc/"),
                F.col("doc_id").cast("string"),
            ),
        )
    keep = "quality_score" if "quality_score" in df.columns else None
    capped = domain_cap(
        df, url_col, max_per_domain=int(max_per_domain), keep_by=keep
    )
    # keep the derived domain as stage metadata; the rank is transient
    out.replace(capped.drop("domain_rank"))
