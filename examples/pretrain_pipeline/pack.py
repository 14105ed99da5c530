"""Stage 7 — sequence packing: documents assigned (in id order) to fixed
token-budget chunks via a distributed exclusive prefix sum — no windows,
no driver loops. Packs by the REAL learned-tokenizer counts when
``tokens_col`` is set (the tokenize stage upstream), else the
whitespace stand-in."""
from basis_devkit_spark import *


@node
def pack(
    docs=InputTable,
    out=OutputTable,
    max_tokens=Parameter(type="int", default=512),
    tokens_col=Parameter(type="str", default=""),
):
    from basis_devkit_spark.operators.text import pack_sequences

    out.replace(
        pack_sequences(
            docs.read_dataframe(), id_col="doc_id", text_col="text",
            budget=int(max_tokens), n_tokens_col=(tokens_col or None),
        )
    )
