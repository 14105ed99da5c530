"""Stage 6 — sequence packing: documents assigned (in id order) to fixed
token-budget chunks via a distributed exclusive prefix sum — no windows,
no driver loops."""
from basis_devkit_spark import *


@node
def pack(
    docs=InputTable,
    out=OutputTable,
    max_tokens=Parameter(type="int", default=512),
):
    from basis_devkit_spark.operators.text import pack_sequences

    out.replace(
        pack_sequences(
            docs.read_dataframe(), id_col="doc_id", text_col="text",
            budget=int(max_tokens),
        )
    )
