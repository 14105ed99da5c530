"""Per-document distribution signals: char-entropy gate (keyboard mash,
repeated-glyph blobs) + MAD robust length outliers (heavy-tail-safe —
one 10 MB artifact can't inflate its own baseline)."""
from basis_devkit_spark import *


@node
def signals(
    docs=InputTable,
    out=OutputTable,
    outlier_k=Parameter(type="float", default=3.5),
):
    from basis_devkit_spark.operators.text import char_entropy_signals
    from basis_devkit_spark.operators.timeseries import robust_outliers

    d = docs.read_dataframe()
    ent = char_entropy_signals(d.select("doc_id", "text"))
    lo = robust_outliers(
        d.select("doc_id", "source", "n_chars"), "n_chars",
        group_col="source", k=float(outlier_k),
    ).select("doc_id", "source", "robust_z", "is_outlier")
    out.replace(ent.join(lo, "doc_id"))
