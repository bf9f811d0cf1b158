"""JVM-side column function library used by the extension operators."""

from data_toolz_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from data_toolz_spark.functions.text import (
    tokens,
    token_count,
    word_shingles,
    normalized_text,
    text_fingerprint,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "tokens",
    "token_count",
    "word_shingles",
    "normalized_text",
    "text_fingerprint",
]
