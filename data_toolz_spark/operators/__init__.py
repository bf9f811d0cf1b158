"""Large-scale LLM-data-pipeline operators (SURVEY §2.9 extensions)."""

from data_toolz_spark.operators.dedup import (
    dedup_exact,
    minhash_signature,
    minhash_near_duplicates,
    simhash32,
    exact_jaccard_pairs,
)
from data_toolz_spark.operators.similarity import (
    cosine_topk,
    lsh_bucket,
    cosine_topk_ann,
    cosine_near_duplicates,
)
from data_toolz_spark.operators.text_analysis import (
    language_id,
    quality_features,
    token_stats,
)
from data_toolz_spark.operators.windows import (
    sessionize,
    session_stats,
    running_total,
    asof_join,
)
from data_toolz_spark.operators.skew import (
    salted_aggregate,
    replicate_hot_keys_join,
)
from data_toolz_spark.operators.multimodal import (
    decode_media,
    resize_media,
    sample_frames,
    fake_media_table,
)

__all__ = [
    "salted_aggregate",
    "replicate_hot_keys_join",
    "session_stats",
    "running_total",
    "decode_media",
    "resize_media",
    "sample_frames",
    "fake_media_table",
    "dedup_exact",
    "minhash_signature",
    "minhash_near_duplicates",
    "simhash32",
    "exact_jaccard_pairs",
    "cosine_topk",
    "lsh_bucket",
    "cosine_topk_ann",
    "cosine_near_duplicates",
    "language_id",
    "quality_features",
    "token_stats",
    "sessionize",
    "asof_join",
]
