"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

All hot paths are JVM-side expressions (higher-order array functions +
xxhash64) — no Python UDFs — so they whole-stage-codegen and scale to
cluster data sizes.  Design notes per operator:

* ``dedup_exact`` — one hash-aggregate shuffle on the key columns; the
  representative is ``min(id)`` so output is deterministic (unlike
  ``dropDuplicates``, which keeps an arbitrary row per key).
* ``minhash_near_duplicates`` — the standard shingle → minhash → band →
  bucket-join pipeline.  Signatures are computed *without any shuffle*
  (per-row array expressions); the only shuffles are the band-bucket
  self-join and final dedup.  Banding parameters (n_hashes=64, rows=2
  per band → 32 bands) give P[miss] = (1-s²)³² ≤ 1e-13 for s ≥ 0.8, so
  for high thresholds the output equals the exact-Jaccard join with
  overwhelming probability while scanning ~|bands|·n rows instead of
  n² pairs.  Skewed buckets (very common shingle sets) are AQE's
  skew-join territory; callers can also raise ``bands``/``rows``.
* ``simhash32`` — 32-bit SimHash over the token set, one aggregate
  expression per row; bit arithmetic only (md5-derived per-token hash
  so any ANSI-SQL engine can reproduce values bit-for-bit).
* ``exact_jaccard_pairs`` — blocked O(block²) verification join; used
  standalone on small blocks (same language, same length bucket) or as
  the verify stage after LSH candidate generation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_toolz_spark.functions.text import tokens as text_tokens


def dedup_exact(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Deterministic exact dedup: one row per distinct key tuple.

    Returns ``key_cols + [id_col, n_copies]`` where ``id_col`` is the
    minimum id in the group (stable representative).  Single
    hash-aggregate; partial aggregation (map-side combine) keeps the
    shuffle proportional to the number of *distinct* keys.
    """
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------


def _distinct_tokens(text_col: Column | str) -> Column:
    return F.array_distinct(text_tokens(text_col))


def minhash_signature(
    text_col: Column | str,
    n_hashes: int = 64,
) -> Column:
    """MinHash signature (array<bigint>) of the distinct token set.

    Hash family: ``xxhash64(token, i)`` for i in [0, n_hashes) — the
    extra literal column acts as the per-function seed.  The whole
    signature is one nested array expression: zero shuffles, fully
    codegen'd.
    """
    toks = _distinct_tokens(text_col)
    return F.array(
        *[
            F.array_min(F.transform(toks, lambda t, i=i: F.xxhash64(t, F.lit(i))))
            for i in range(n_hashes)
        ]
    )


def _band_hashes(signature: Column, bands: int, rows: int) -> Column:
    """Hash each band (slice of ``rows`` minhashes) to a single long."""
    return F.array(
        *[
            F.xxhash64(F.slice(signature, b * rows + 1, rows), F.lit(b))
            for b in range(bands)
        ]
    )


def jaccard(tokens_a: Column, tokens_b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays (double)."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b))
    union = F.size(F.array_union(tokens_a, tokens_b))
    return inter.cast("double") / union.cast("double")


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH, verified with exact Jaccard.

    Output: ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` and
    ``jaccard >= threshold`` (rounded to 6 for cross-engine equality).

    Plan shape: signature/bands per row (no shuffle) → explode bands →
    self-join on (band index, band hash) → distinct candidate pairs →
    exact Jaccard verify on the token arrays.  The candidate join is
    the only quadratic-risk step and it is bounded by bucket sizes,
    not n².
    """
    if n_hashes % bands != 0:
        raise ValueError("n_hashes must be divisible by bands")
    rows = n_hashes // bands

    base = df.select(
        F.col(id_col).alias("__id"),
        _distinct_tokens(text_col).alias("__toks"),
        minhash_signature(text_col, n_hashes).alias("__sig"),
    )
    banded = base.select(
        "__id",
        "__toks",
        F.posexplode(_band_hashes(F.col("__sig"), bands, rows)).alias(
            "__band", "__bucket"
        ),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    candidates = (
        left.join(
            right,
            on=[
                F.col("a.__band") == F.col("b.__band"),
                F.col("a.__bucket") == F.col("b.__bucket"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__toks").alias("toks_a"),
            F.col("b.__toks").alias("toks_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        candidates.withColumn(
            "jaccard", F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_cols: Sequence[str],
    threshold: float,
    shingle: int = 1,
) -> DataFrame:
    """Blocked exact-Jaccard pairs — the brute-force verify path.

    O(block²) within each block (e.g. same language + length bucket);
    use LSH (``minhash_near_duplicates``) when blocks are large.
    ``shingle > 1`` compares n-word-shingle sets instead of token sets.
    """
    from data_toolz_spark.functions.text import word_shingles

    elems = (
        _distinct_tokens(text_col)
        if shingle == 1
        else F.array_distinct(word_shingles(text_col, shingle))
    )
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        elems.alias("__elems"),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col("a.__id") < F.col("b.__id"))
    return (
        a.join(b, on=cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(jaccard(F.col("a.__elems"), F.col("b.__elems")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def _token_hash32(token: Column) -> Column:
    """Engine-portable 32-bit token hash: first 8 hex chars of md5.

    Chosen over xxhash64 so ANSI-SQL oracles (DuckDB etc.) can
    reproduce SimHash values exactly; swap for ``F.xxhash64`` when
    cross-engine equality is not required.
    """
    return F.conv(F.substring(F.md5(F.encode(token, "UTF-8")), 1, 8), 16, 10).cast(
        "long"
    )


def simhash32(text_col: Column | str) -> Column:
    """32-bit SimHash of the distinct token set (bigint).

    bit b of the result = 1 iff Σ_tokens (2·bit_b(hash(tok)) - 1) > 0.
    One aggregate expression per row: fold the token array into a
    32-slot sign-count array, then repack the sign bits.
    """
    toks = _distinct_tokens(text_col)
    zero = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)
    bit_votes = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
                lambda b: F.getbit(_token_hash32(t), b) * 2 - 1,
            ),
            lambda x, y: x + y.cast("long"),
        ),
    )
    # pack sign bits: bit b contributes 2^b when the vote is positive
    # (pow-based because shiftleft needs a literal count; 2^b is exact
    # in double for b < 53)
    packed = F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda vote, b: F.when(
                vote > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return packed


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 2,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Pairs whose SimHash Hamming distance ≤ ``max_hamming``.

    Blocked self-join + ``bit_count(xor)`` verify.  For cluster scale,
    block on simhash bands (rotate-and-sort / 4×8-bit chunks) instead
    of metadata columns; metadata blocking keeps this oracle-checkable.
    """
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        simhash32(text_col).alias("__sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col("a.__id") < F.col("b.__id"))
    return (
        a.join(b, on=cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(
                F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


__all__ = [
    "dedup_exact",
    "minhash_signature",
    "minhash_near_duplicates",
    "exact_jaccard_pairs",
    "jaccard",
    "simhash32",
    "simhash_near_duplicates",
    "SIMHASH_BITS",
]
