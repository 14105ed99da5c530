"""Stage 7 — sequence packing: documents assigned to fixed token-budget
chunks via a distributed exclusive prefix sum — no windows, no driver
loops. Packs by the REAL learned-tokenizer counts when ``tokens_col`` is
set (the tokenize stage upstream), else the whitespace stand-in.

Layout order defaults to DETERMINISTIC SHUFFLED (``shuffle=true``):
adjacent doc ids are usually corpus-correlated (same crawl host, same
source shard), and id-order packing puts those correlated documents in
the same training sequence — exactly the practice
``sequence_pack_shuffled``'s hash-order layout exists to avoid, while
staying byte-reproducible for resumes and audits (order key =
xxhash64(id, salt), no RNG state). Set ``shuffle=false`` for the plain
id-order layout (e.g. when downstream tooling expects monotone ids
within a chunk). Output contract is the same per-chunk summary either
way: (chunk_id, n_docs, total_tokens, first_doc, last_doc)."""
from basis_devkit_spark import *


@node
def pack(
    docs=InputTable,
    out=OutputTable,
    max_tokens=Parameter(type="int", default=512),
    tokens_col=Parameter(type="str", default=""),
    shuffle=Parameter(type="bool", default=True),
):
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.text import (
        pack_sequences,
        sequence_pack_shuffled,
    )

    df = docs.read_dataframe()
    if shuffle:
        perdoc = sequence_pack_shuffled(
            df, id_col="doc_id", text_col="text",
            budget=int(max_tokens), n_tokens_col=(tokens_col or None),
        )
        packed = (
            perdoc.groupBy(F.col("seq_id").alias("chunk_id"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.min("doc_id").alias("first_doc"),
                F.max("doc_id").alias("last_doc"),
            )
        )
    else:
        packed = pack_sequences(
            df, id_col="doc_id", text_col="text",
            budget=int(max_tokens), n_tokens_col=(tokens_col or None),
        )
    out.replace(packed)
