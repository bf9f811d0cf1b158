"""Vector math over ``array<float|double>`` columns — pure JVM-side.

Everything here is built from Spark's higher-order array functions
(``zip_with``, ``aggregate``, ``transform``) so the hot path stays
inside whole-stage codegen: no Python UDFs, no serialization boundary,
and Catalyst can still prune/push around these expressions.

All arithmetic is done in DOUBLE regardless of the input element type so
results are reproducible against any double-precision oracle (the
driver's DuckDB check) and stable across float32 storage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(vec: Column | str) -> Column:
    col = F.col(vec) if isinstance(vec, str) else vec
    return col.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential left fold, double)."""
    products = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(vec: Column | str) -> Column:
    """√Σ vᵢ² — the vector's Euclidean length."""
    squares = F.transform(_as_double(vec), lambda x: x * x)
    return F.sqrt(F.aggregate(squares, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def unit_vector(vec: Column | str) -> Column:
    """v / ‖v‖ (array<double>); NULL for the zero vector.

    Pre-normalizing once per row turns every downstream pairwise cosine
    into a bare dot product — at scale this moves the two norm
    computations out of the O(pairs) inner loop into the O(rows) scan.
    """
    v = _as_double(vec)
    norm = l2_norm(v)
    return F.when(norm > 0, F.transform(v, lambda x: x / norm))


def quantize_int8(vec: Column | str) -> Column:
    """Symmetric int8 quantization: struct(codes array<tinyint>, scale).

    ``codes[i] = round(v[i] / scale)`` with ``scale = max|v| / 127`` —
    the standard per-vector symmetric scheme.  At 100 TB an
    ``array<float>`` embedding column is often the single largest
    column; int8 codes cut its storage and shuffle width 4× while
    keeping cosine recall high (error bound pinned in tests).  Pure
    higher-order functions, so quantization runs inside codegen during
    the ingest scan — no Python boundary.

    The zero vector gets scale 0 and all-zero codes (dequantizes to
    itself).
    """
    v = _as_double(vec)
    max_abs = F.aggregate(
        F.transform(v, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = max_abs / F.lit(127.0)
    codes = F.when(
        max_abs > 0, F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(codes.alias("codes"), scale.alias("scale"))


def dequantize_int8(q: Column | str) -> Column:
    """Inverse of :func:`quantize_int8`: codes·scale → array<double>."""
    col = F.col(q) if isinstance(q, str) else q
    return F.transform(
        col.getField("codes").cast("array<double>"),
        lambda x: x * col.getField("scale"),
    )


__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "unit_vector",
    "quantize_int8",
    "dequantize_int8",
]
