"""Stage 6a — tokenizer FIT (build-once artifact producer): learn the
BPE merge table on the selected corpus and persist BOTH tokenizer
artifacts — the merge table and the tokenized vocabulary the
vocabulary-indexed apply consumes (emitted by the same fit, zero extra
passes). Declared ``artifact: true`` in graph.yml, so ``run_graph``
skips this node once the artifacts exist: the refit-free path never
rescans raw history (re-fit = explicit ``run_node('tokenizer_fit')``,
or a c21-style streaming maintainer keeping the word relation fresh)."""
from basis_devkit_spark import *


@node
def tokenizer_fit(
    docs=InputTable,
    merges_out=OutputTable,
    vocab_out=OutputTable,
    num_merges=Parameter(type="int", default=16),
):
    from basis_devkit_spark.operators.bpe import (
        bpe_learn_merges,
        release_tokenizer_vocab,
    )

    mt, vocab = bpe_learn_merges(
        docs.read_dataframe(), num_merges=int(num_merges),
        batch_merges=4, emit_vocab=True,
    )
    merges_out.replace(mt)
    vocab_out.replace(vocab)
    # artifacts are persisted; drop the pinned checkpoint blocks
    release_tokenizer_vocab(vocab)
