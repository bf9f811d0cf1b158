"""Text metric functions over string columns — pure JVM-side.

Tokenization is deliberately simple and *oracle-reproducible*: the same
split / regex semantics can be written in ANSI SQL (DuckDB), so every
operator built on these functions is value-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties removed — array<string>."""
    return F.filter(F.split(_c(text), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via BPE_TOKEN_REGEX (regexp_count)."""
    return F.regexp_count(_c(text), F.lit(BPE_TOKEN_REGEX))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """n-word shingles of the whitespace tokens — array<string>.

    Built with ``sequence`` + ``transform`` + ``slice`` so shingling is
    a single codegen'd expression; rows shorter than ``n`` tokens yield
    an empty array.
    """
    toks = tokens(text)
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def normalized_text(text: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim — canonical doc form."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def text_fingerprint(text: Column | str) -> Column:
    """Deterministic 128-bit hex fingerprint of the normalized text.

    md5 on both Spark and ANSI-SQL oracles makes this value-checkable;
    use ``F.xxhash64`` for a cheaper non-cryptographic variant when
    cross-engine equality is not needed.
    """
    return F.md5(F.encode(normalized_text(text), "UTF-8"))


__all__ = [
    "tokens",
    "token_count",
    "bpe_token_count",
    "word_shingles",
    "normalized_text",
    "text_fingerprint",
    "BPE_TOKEN_REGEX",
]
