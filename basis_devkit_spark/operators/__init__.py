"""LLM-data-pipeline operators (SURVEY §2.D) + relational extensions the
reference's SQL surface lacks natively (as-of / range joins).

All hot paths are JVM-side column expressions (no row-at-a-time Python);
Pandas UDFs appear only at genuine model/decode boundaries (multimodal).
"""

from basis_devkit_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_near_dup_pairs,
    minhash_dedup,
    simhash,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
    ngram_contamination,
    connected_components,
    multi_benchmark_contamination,
    source_vocab_overlap,
)
from basis_devkit_spark.operators.similarity import (
    cosine_similarity_col,
    brute_force_topk,
    lsh_topk,
    ivf_topk,
    embedding_near_dup_pairs,
)
from basis_devkit_spark.operators.text import (
    text_stats,
    quality_score,
    language_id,
    token_count,
    doc_fingerprint,
    tfidf,
    filter_corpus,
    pack_sequences,
    mixture_sample,
    train_val_test_split,
    exclusive_prefix_sum,
    repetition_stats,
    redact_pii,
    ngram_counts,
    cross_doc_dup_ngram_frac,
    token_budget_sample,
    chunk_documents,
)
from basis_devkit_spark.operators.joins import scd2_merge, as_of_join, range_join
from basis_devkit_spark.operators.skew import salted_agg, salted_join
from basis_devkit_spark.operators.embeddings import (
    label_centroids,
    corpus_embedding_stats,
    dequantize_int8,
    quantize_int8,
)

__all__ = [
    "connected_components",
    "tfidf",
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "ngram_contamination",
    "cosine_similarity_col",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_dup_pairs",
    "text_stats",
    "quality_score",
    "language_id",
    "token_count",
    "doc_fingerprint",
    "as_of_join",
    "range_join",
    "scd2_merge",
    "salted_agg",
    "salted_join",
    "quantize_int8",
    "dequantize_int8",
    "corpus_embedding_stats",
    "label_centroids",
    "train_val_test_split",
    "filter_corpus",
    "pack_sequences",
    "mixture_sample",
    "exclusive_prefix_sum",
    "repetition_stats",
    "redact_pii",
    "ngram_counts",
    "cross_doc_dup_ngram_frac",
    "token_budget_sample",
    "chunk_documents",
    "gopher_rules",
    "weighted_reservoir_sample",
    "profile_numeric",
    "source_vocab_overlap",
    "multi_benchmark_contamination",
    "wav_header_fields",
    "sessionize",
    "session_stats",
    "funnel",
    "funnel_single_pass",
    "retention_cohorts",
    "event_transitions",
    "conversion_latency",
    "session_paths",
    "rfm_profiles",
    "inter_event_gaps",
    "trailing_window_counts",
    "assign_experiment",
    "srm_check",
    "time_bucket_gapfill",
    "zscore_anomalies",
]

from basis_devkit_spark.operators.events import (  # noqa: E402
    assign_experiment,
    conversion_latency,
    event_transitions,
    funnel,
    funnel_single_pass,
    inter_event_gaps,
    retention_cohorts,
    rfm_profiles,
    session_paths,
    session_stats,
    srm_check,
    trailing_window_counts,
    sessionize,
)
from basis_devkit_spark.operators.text import (  # noqa: E402
    gopher_rules,
    profile_numeric,
    weighted_reservoir_sample,
)
from basis_devkit_spark.operators.multimodal import wav_header_fields  # noqa: E402
from basis_devkit_spark.operators.timeseries import (  # noqa: E402
    time_bucket_gapfill,
    zscore_anomalies,
)
