"""Stage 2 — hybrid query: BM25 lexical top-k over the documents fused
(reciprocal rank) with quantized-ANN top-k served FROM the persisted
index stores; float vectors are read only for the bounded rescore."""
from basis_devkit_spark import *


@node
def query(
    docs=InputTable,
    emb=InputTable,
    quant=InputTable,
    cells=InputTable,
    out=OutputTable,
    terms=Parameter(type="string", default="spark"),
    k=Parameter(type="int", default=10),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.retrieval import bm25_topk, rrf_fuse
    from basis_devkit_spark.operators.similarity import (
        ivf_quantized_topk_indexed,
    )

    d = docs.read_dataframe()
    vecs = emb.read_dataframe()
    lex = bm25_topk(d, [t.strip() for t in str(terms).split(",")], k=2 * int(k))
    cents = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    q0 = vecs.filter(F.col("vec_id") < 1)
    ann = ivf_quantized_topk_indexed(
        q0, cells.read_dataframe(), vecs, cents, quant.read_dataframe(),
        k=2 * int(k), nprobe=4,
    ).select(F.col("match_id").alias("doc_id"), "rank")
    out.replace(rrf_fuse([lex, ann], k=int(k)))
