"""Stage 1 — index build: fit the per-dimension scalar quantizer on the
corpus (bounded dim-row artifact) and code every vector into its
seed-centroid cell (id, cell, int8 codes) — both persisted as versioned
stores. The coarse query path will touch ONLY these artifacts."""
from basis_devkit_spark import *


@node
def build_index(
    emb=InputTable,
    quant_out=OutputTable,
    cells_out=OutputTable,
    nlist=Parameter(type="int", default=8),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.similarity import (
        fit_scalar_quantizer,
        quantized_cells_assign,
    )

    vecs = emb.read_dataframe()
    quant = fit_scalar_quantizer(vecs)
    cents = vecs.filter(F.col("vec_id") < int(nlist)).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("center"),
    )
    quant_out.replace(quant)
    cells_out.replace(quantized_cells_assign(vecs, cents, quant))
