"""Large-scale LLM-data-pipeline operators (SURVEY §2.9 extensions)."""

from data_toolz_spark.operators.classifier import (
    LogRegModel,
    logreg_fit,
    logreg_score,
)
from data_toolz_spark.operators.clustering import (
    KMeansModel,
    kmeans_assign,
    kmeans_cluster_profile,
    kmeans_fit,
)
from data_toolz_spark.operators.bpe import (
    bpe_apply_expr,
    bpe_token_count_expr,
    bpe_train,
    bpe_word_table,
)
from data_toolz_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    fingerprint_band_pairs,
    fingerprint_components,
    exact_jaccard_pairs,
    minhash_near_duplicates,
    minhash_signature,
    near_duplicate_drop_list,
    simhash32,
    simhash_band_pairs,
)
from data_toolz_spark.operators.similarity import (
    cosine_near_duplicates,
    cosine_near_duplicates_lsh,
    cosine_topk,
    cosine_topk_ann,
    ivf_topk,
    ivfpq_topk,
    lsh_bucket,
    train_ivfpq_model,
    semantic_dedup,
)
from data_toolz_spark.operators.text_analysis import (
    bigram_logprob,
    build_bigram_counts,
    build_vocab,
    chunk_documents,
    fingerprint,
    keep_document,
    language_id,
    line_dedup,
    quality_features,
    redact_artifacts,
    remove_duplicate_spans,
    repetition_features,
    strip_html,
    tfidf_terms,
    token_stats,
    unigram_logprob,
    vocab_coverage,
    web_artifact_features,
)
from data_toolz_spark.operators.decontamination import (
    decontaminated,
    embedding_decontaminate,
    eval_gram_set,
    ngram_decontaminate,
)
from data_toolz_spark.operators.sampling import (
    component_split,
    hash_split,
    mixture_rates,
    mixture_sample,
    pack_greedy,
    split_column,
    stratified_sample,
)
from data_toolz_spark.operators.incremental import (
    append_to_catalog,
    append_to_ivf_index,
    append_to_minhash_index,
    build_fingerprint_catalog,
    build_ivf_index,
    catalog_bloom,
    build_minhash_index,
    incremental_near_duplicates,
    ivf_query_index,
    minhash_index_open_txns,
    novel_documents,
    repair_minhash_index,
    validate_minhash_index,
)
from data_toolz_spark.operators.search import (
    append_to_text_index,
    build_text_index,
    search_terms,
)
from data_toolz_spark.operators.urls import (
    canonical_url,
    extract_urls,
    url_dedup,
)
from data_toolz_spark.operators.graph import (
    pagerank,
)
from data_toolz_spark.operators.windows import (
    bucketed_interval_join,
    asof_join,
    running_total,
    session_stats,
    sessionize,
)
from data_toolz_spark.operators.skew import (
    replicate_hot_keys_join,
    salted_aggregate,
)
from data_toolz_spark.operators.image_dedup import (
    image_phash,
    phash_components,
    phash_from_pixels,
    phash_near_duplicates,
    png_neardup_table,
)
from data_toolz_spark.operators.multimodal import (
    audio_features,
    decode_media,
    decode_png,
    encode_png,
    fake_audio_table,
    fake_media_table,
    resize_media,
    sample_frames,
)

__all__ = [
    # dedup
    "connected_components",
    "bpe_apply_expr",
    "bpe_token_count_expr",
    "bpe_train",
    "bpe_word_table",
    "dedup_exact",
    "KMeansModel",
    "LogRegModel",
    "logreg_fit",
    "logreg_score",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_cluster_profile",
    "fingerprint_band_pairs",
    "fingerprint_components",
    "exact_jaccard_pairs",
    "minhash_near_duplicates",
    "minhash_signature",
    "near_duplicate_drop_list",
    "simhash32",
    "simhash_band_pairs",
    # similarity
    "cosine_near_duplicates",
    "cosine_near_duplicates_lsh",
    "cosine_topk",
    "cosine_topk_ann",
    "ivf_topk",
    "ivfpq_topk",
    "train_ivfpq_model",
    "lsh_bucket",
    "semantic_dedup",
    # text analysis
    "build_vocab",
    "build_bigram_counts",
    "bigram_logprob",
    "strip_html",
    "vocab_coverage",
    "unigram_logprob",
    "chunk_documents",
    "fingerprint",
    "keep_document",
    "language_id",
    "line_dedup",
    "quality_features",
    "redact_artifacts",
    "remove_duplicate_spans",
    "repetition_features",
    "token_stats",
    "web_artifact_features",
    # decontamination
    "decontaminated",
    "embedding_decontaminate",
    "eval_gram_set",
    "ngram_decontaminate",
    # sampling / splitting / packing
    "component_split",
    "hash_split",
    "mixture_rates",
    "mixture_sample",
    "pack_greedy",
    "split_column",
    "stratified_sample",
    # incremental state
    "append_to_catalog",
    "append_to_ivf_index",
    "append_to_minhash_index",
    "build_ivf_index",
    "ivf_query_index",
    "build_fingerprint_catalog",
    "build_minhash_index",
    "incremental_near_duplicates",
    "minhash_index_open_txns",
    "validate_minhash_index",
    "repair_minhash_index",
    "novel_documents",
    # search
    "append_to_text_index",
    "build_text_index",
    "search_terms",
    # urls
    "canonical_url",
    "extract_urls",
    "url_dedup",
    # windows
    "asof_join",
    "bucketed_interval_join",
    "pagerank",
    "running_total",
    "session_stats",
    "sessionize",
    # skew
    "replicate_hot_keys_join",
    "salted_aggregate",
    # multimodal
    "audio_features",
    "decode_media",
    "image_phash",
    "phash_from_pixels",
    "phash_near_duplicates",
    "phash_components",
    "png_neardup_table",
    "decode_png",
    "encode_png",
    "fake_audio_table",
    "fake_media_table",
    "resize_media",
    "sample_frames",
]
