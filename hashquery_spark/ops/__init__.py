"""Net-new large-scale training-data pipeline operators.

These go beyond the reference's surface (hashquery is a BI query DSL) and
add the operations a 100 TB training-data pipeline needs: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language ID, quality
scoring, token counting, fingerprinting), and multimodal column plumbing.

All operators are DataFrame -> DataFrame functions built from JVM-side
``pyspark.sql.functions`` (no Python row loops); the only Pandas UDFs are
in the multimodal decode path where per-blob Python is unavoidable.
Every hash is derived from md5 so a DuckDB oracle can reproduce results
bit-for-bit.
"""

from .dedup import (
    dedup_clusters,
    connected_components,
    dedup_keep_best,
    exact_dedup,
    lsh_tuning_report,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    soft_dedup,
)
from .similarity import (
    embedding_quantize,
    ivf_index,
    ivf_search,
    ann_brute_force,
    semantic_dedup,
    embedding_near_dup,
    embedding_join,
    ivf_ann,
    lsh_ann,
    random_hyperplanes,
)
from .contamination import bloom_contamination, ngram_contamination
from .curation import curate
from .sampling import (
    cap_per_group,
    kfold_split,
    global_shuffle,
    pack_sequences,
    pack_texts,
    repetition_score,
    reservoir_sample,
    stratified_sample,
    train_test_split,
    uniform01,
    weighted_sample,
)
from .text import (
    boilerplate_ngrams,
    char_entropy,
    bpe_pair_counts,
    pmi_bigrams,
    compression_ratio,
    script_profile,
    doc_fingerprint,
    language_id,
    pii_scrub,
    quality_score,
    redact_pii,
    tfidf_top_terms,
    token_count,
    unigram_lm_score,
    bigram_lm_score,
    perplexity_buckets,
    ngram_novelty,
    vocabulary,
    zipf_fit,
)
from .multimodal import (
    decode_blob_metadata,
    extract_features,
    frame_sample,
    resize_image,
    with_binary_column,
)
from .skew import salted_aggregate, salted_join
from .asof import asof_join
from .range_join import range_join, validity_join
from .chunking import chunk_documents, dedup_paragraphs, repeated_spans
from .clustering import embedding_pca, embedding_centroids, kmeans_assign, kmeans_fit
from .profile import (
    approx_quantiles,
    grid_percentiles,
    k_anonymity,
    k_suppress,
    ks_test,
    l_diversity,
    mutual_information,
    trimmed_mean,
    dp_count,
    dp_sum,
    winsorize,
    check_constraints,
    chi_square_drift,
    distribution_drift,
    histogram,
    js_divergence,
    profile_table,
    quantile_bucketize,
    zscore_outliers,
    mad_outliers,
    standardize,
)
from .timeseries import counter_delta, gap_fill, interarrival_stats, multi_grain_rollup, refresh_rollup, time_weighted_avg, trailing_agg
from .snapshot import dedup_against, dedup_against_fuzzy, snapshot_diff

from .preference import bradley_terry, bradley_terry_oracle_sql
from .pii import PII_PATTERNS, pii_redact, pii_stats
from .tokenizer import (
    unigram_apply,
    unigram_pieces_df,
    unigram_train,
    unigram_train_from_words,
)
from .evaluation import (
    ab_test_report,
    binary_auc,
    calibration_bins,
    cohens_kappa,
    fairness_report,
    fleiss_kappa,
    pass_at_k,
    rouge_l,
    translation_metrics,
)
from .sketches import heavy_hitters, corpus_overlap, kll_quantiles, merge_sketch_rollup, sketch_rollup
from .importance import dsir_weights
from .graph import degree_centrality, pagerank
from .retrieval import bm25_search, retrieval_metrics
from .rules import c4_filters, gopher_rules
from .tokenizer import bpe_apply, bpe_merges_df, bpe_train
from .urls import host_rollup, parse_urls
from .masking import plan_span_corruption

from .classifier import (
    ClassifierModel,
    classifier_fit,
    classifier_score,
    token_bucket_py,
)
from .fuzzy import fuzzy_join
from .mixing import mix_corpora, ws_token_count

__all__ = [
    "dedup_clusters",
    "exact_dedup",
    "minhash_signature",
    "lsh_tuning_report",
    "minhash_lsh_candidates",
    "simhash",
    "soft_dedup",
    "ngram_jaccard_pairs",
    "ann_brute_force",
    "semantic_dedup",
    "gopher_rules",
    "c4_filters",
    "calibration_bins",
    "cohens_kappa",
    "fairness_report",
    "fleiss_kappa",
    "embedding_near_dup",
    "embedding_quantize",
    "embedding_join",
    "ivf_ann",
    "ivf_index",
    "ivf_search",
    "lsh_ann",
    "random_hyperplanes",
    "language_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "vocabulary",
    "zipf_fit",
    "ngram_novelty",
    "tfidf_top_terms",
    "boilerplate_ngrams",
    "unigram_lm_score",
    "bigram_lm_score",
    "perplexity_buckets",
    "pii_scrub",
    "redact_pii",
    "pack_sequences",
    "pack_texts",
    "cap_per_group",
    "decode_blob_metadata",
    "extract_features",
    "frame_sample",
    "resize_image",
    "with_binary_column",
    "bloom_contamination",
    "ngram_contamination",
    "curate",
    "global_shuffle",
    "repetition_score",
    "reservoir_sample",
    "stratified_sample",
    "train_test_split",
    "uniform01",
    "asof_join",
    "range_join",
    "validity_join",
    "chunk_documents",
    "dedup_paragraphs",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_merges_df",
    "bpe_apply",
    "pmi_bigrams",
    "embedding_centroids",
    "kmeans_assign",
    "kmeans_fit",
    "profile_table",
    "histogram",
    "check_constraints",
    "multi_grain_rollup",
    "refresh_rollup",
    "gap_fill",
    "time_weighted_avg",
    "counter_delta",
    "interarrival_stats",
    "trailing_agg",
    "zscore_outliers",
    "mad_outliers",
    "standardize",
    "chi_square_drift",
    "distribution_drift",
    "js_divergence",
    "script_profile",
    "dedup_keep_best",
    "connected_components",
    "weighted_sample",
    "repeated_spans",
    "compression_ratio",
    "approx_quantiles",
    "k_anonymity",
    "k_suppress",
    "ks_test",
    "l_diversity",
    "mutual_information",
    "trimmed_mean",
    "dp_count",
    "dp_sum",
    "dsir_weights",
    "mix_corpora",
    "ws_token_count",
    "snapshot_diff",
    "dedup_against",
    "dedup_against_fuzzy",
    "fuzzy_join",
    "salted_aggregate",
    "salted_join",
    "bm25_search",
    "retrieval_metrics",
    "ab_test_report",
    "binary_auc",
    "bradley_terry",
    "bradley_terry_oracle_sql",
    "pass_at_k",
    "pii_redact",
    "unigram_apply",
    "unigram_pieces_df",
    "unigram_train",
    "unigram_train_from_words",
    "pii_stats",
    "rouge_l",
    "translation_metrics",
    "sketch_rollup",
    "merge_sketch_rollup",
    "corpus_overlap",
    "embedding_pca",
    "heavy_hitters",
    "kll_quantiles",
    "parse_urls",
    "plan_span_corruption",
    "host_rollup",
    "char_entropy",
    "grid_percentiles",
    "winsorize",
    "quantile_bucketize",
    "kfold_split",
    "degree_centrality",
    "pagerank",
    "ClassifierModel",
    "classifier_fit",
    "classifier_score",
    "token_bucket_py",
]
