"""Stage 6 — learned tokenizer: fit a BPE merge table on the selected
corpus (the tokenized vocabulary is emitted by the SAME fit — zero extra
passes), tokenize with the vocabulary-indexed apply (plan depth constant
in merge count — the only form that compiles at production vocab sizes),
and emit exact subword counts for packing. Both tokenizer artifacts
persist as versioned stores: re-fit on corpus drift, time travel for
free."""
from basis_devkit_spark import *


@node
def tokenize(
    docs=InputTable,
    out=OutputTable,
    merges_out=OutputTable,
    num_merges=Parameter(type="int", default=16),
):
    from basis_devkit_spark.operators.bpe import (
        bpe_learn_merges,
        bpe_token_counts_indexed,
    )

    df = docs.read_dataframe()
    mt, vocab = bpe_learn_merges(
        df, num_merges=int(num_merges), batch_merges=4, emit_vocab=True
    )
    merges_out.replace(mt)
    # counts-only indexed path: packing needs n_tokens, not the token
    # arrays — the regroup shuffle carries one long per doc-partition
    out.replace(bpe_token_counts_indexed(df, vocab, mt))
