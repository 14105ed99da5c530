"""Stage 6b — tokenize against the PERSISTED tokenizer artifacts (the
vocabulary-indexed apply: plan depth constant in merge count — the only
form that compiles at production vocab sizes). Reads the merge table
and tokenized vocabulary from their artifact stores (never refits, never
rescans raw history) and emits exact subword counts for packing; the
vocab join auto-sizes from the store manifest's row count (broadcast ≤
2M rows, AQE shuffled hash above)."""
from basis_devkit_spark import *


@node
def tokenize(
    docs=InputTable,
    merges=InputTable,
    vocab=InputTable,
    out=OutputTable,
):
    from basis_devkit_spark.operators.bpe import bpe_token_counts_indexed

    # counts-only indexed path: packing needs n_tokens, not the token
    # arrays — the regroup shuffle carries one long per doc-partition
    out.replace(
        bpe_token_counts_indexed(
            docs.read_dataframe(),
            vocab.read_dataframe(),
            merges.read_dataframe(),
        )
    )
