"""Mergeable cardinality sketches for corpus-scale distinct counts.

At 100 TB, ``COUNT(DISTINCT url)`` is the expensive question: an exact
answer shuffles every distinct key once.  The HyperLogLog surface here
(Spark's Apache DataSketches integration, public since Spark 3.5) keeps
the answer to a ~``2^lg_k``-byte mergeable state per group:

* the aggregation is **partial-aggregable** — each task folds its rows
  into a local sketch and only the tiny sketch crosses the shuffle, so
  the network cost is O(groups × sketch bytes), independent of row
  count or key cardinality;
* sketches are **stored state, not just answers** — persist one sketch
  row per day/source partition and a later ``hll_union_agg`` over the
  stored sketches answers "distinct over any window" without
  re-scanning history.  This composes with the incremental catalog
  pattern (``operators/incremental.py``): fold each increment's sketch
  into the running row and 100 TB of history is never re-read.

HLL union is deterministic, order-independent, and associative over
sketch STATE — unioning the same set of part-sketches gives the same
estimate regardless of how many parts there are or how they are
grouped (pinned by tests; this is what makes daily folding drift-free).
It is NOT bit-identical to a single pass over the raw rows: the union
path promotes sketches to the dense HLL_8 representation, so a unioned
estimate can differ from a one-shot sketch by a value inside the
sketch's error bound (measured: 499 vs 500 on a 500-key column at
lg_k=12).  Both stay within the published HLL error.

Extends the reference's analytics surface (SURVEY §2.9); the reference
(``datatoolz/io.py``) has no aggregation layer at all.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: DataSketches HLL target type: HLL_8 trades a little memory for
#: merge speed and is the safest default for heavily-unioned state.
_TGT = "HLL_8"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hll_sketch(col: Column | str, *, lg_k: int = 12) -> Column:
    """Aggregate: build a binary HLL sketch of the column's distinct
    values (~``2^lg_k`` bytes of state; lg_k=12 ≈ 1.6 % relative
    standard error)."""
    if not 4 <= lg_k <= 21:
        raise ValueError("hll_sketch: lg_k must be in [4, 21]")
    return F.hll_sketch_agg(_c(col), F.lit(lg_k))


def hll_merge(sketch_col: Column | str) -> Column:
    """Aggregate: union already-built sketches (e.g. one per stored
    day/source row) into one sketch — the incremental-rollup step."""
    return F.hll_union_agg(_c(sketch_col), F.lit(True))


def hll_estimate(sketch_col: Column | str) -> Column:
    """Distinct-count estimate (long) from a sketch column."""
    return F.hll_sketch_estimate(_c(sketch_col))


def approx_distinct(col: Column | str, *, rsd: float = 0.016) -> Column:
    """One-shot approximate COUNT(DISTINCT …) (HyperLogLog++,
    partial-aggregable).  Use when only the number is needed; use
    :func:`hll_sketch` when the STATE must be stored and merged."""
    return F.approx_count_distinct(_c(col), rsd)


def distinct_sketch_table(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lg_k: int = 12,
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """One sketch row per group: the persistable building block.

    Emits ``group_cols + [sketch_col, estimate_col]``.  Append one such
    row per ingested partition (day, source, crawl snapshot); roll any
    subset up later with :func:`rollup_sketches` — no history re-scan.
    """
    sk = hll_sketch(value_col, lg_k=lg_k)
    return df.groupBy(*group_cols).agg(
        sk.alias(sketch_col),
        hll_estimate(sk).alias(estimate_col),
    )


def rollup_sketches(
    sketch_df: DataFrame,
    group_cols: Sequence[str],
    *,
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Union stored sketch rows up to a coarser grouping.

    ``rollup_sketches(t, [])`` gives the global distinct estimate from
    per-partition rows.  HLL union is associative and order-independent
    over sketch state, so the rollup is drift-free: any regrouping of
    the same part-sketches yields the same estimate (tested), and every
    estimate stays inside the sketch's published error vs exact.
    """
    merged = hll_merge(sketch_col)
    grouped = (
        sketch_df.groupBy(*group_cols) if group_cols else sketch_df.groupBy()
    )
    return grouped.agg(
        merged.alias(sketch_col),
        hll_estimate(merged).alias(estimate_col),
    )


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable FREQUENCY state (heavy hitters)
# ---------------------------------------------------------------------------
#
# The frequency twin of the HLL surface above (Cormode & Muthukrishnan,
# "An improved data stream summary: the count-min sketch and its
# applications", J. Algorithms 2005).  The sketch is represented as a
# TABLE of (row, cell, count) — d·w rows, bounded state — rather than
# an opaque binary blob, because in Spark that makes every operation a
# plain relational one:
#
# * BUILD is one explode(×d) + partial-combined hash aggregate — at
#   most d·w cells per group cross the shuffle, independent of row
#   count or key cardinality (same contract as the HLL rows);
# * MERGE is GROUP BY (row, cell) SUM(count) — associative,
#   order-independent, drift-free, and expressible on STORED sketch
#   rows from any number of increments without re-scanning history;
# * ESTIMATE for a candidate key set is a join against ≤ d·w sketch
#   rows (broadcast-able by construction) + MIN over the d hashed
#   cells.  CMS never underestimates: est ≥ true count always, and
#   est ≤ true + ε·N with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
#
# Hashing: the default is ``xxhash64(key, row)`` (JVM codegen, fast).
# ``portable=True`` derives each cell from md5 hex — bit-identical
# across engines (the same trick as ``simhash64(portable_hash=True)``),
# which makes the ENTIRE sketch, not just its error bound, verifiable
# against a DuckDB oracle — the thing SURVEY §2.9 X39 documents as
# impossible for the DataSketches HLL binary state.


def _cms_cell(col: Column, row: int, w: int, portable: bool) -> Column:
    if portable:
        # first 15 md5 hex chars as a 60-bit int — cross-engine
        h = F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f"|{row}"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(w)).cast("int")
    return F.pmod(F.xxhash64(col, F.lit(row)), F.lit(w)).cast("int")


def _cms_validate(d: int, w: int) -> None:
    if not 1 <= d <= 16:
        raise ValueError("cms: d (hash rows) must be in [1, 16]")
    if not 2 <= w <= 1 << 24:
        raise ValueError("cms: w (cells per row) must be in [2, 2^24]")


def cms_sketch_table(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    *,
    d: int = 4,
    w: int = 1024,
    portable: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``key_col``'s frequencies as a
    (``group_cols`` +) ``row, cell, count`` table — the persistable
    building block; NULL keys are excluded (they have no frequency
    question to answer).  ``weight_col`` aggregates a weight per
    occurrence instead of 1 (e.g. pre-aggregated term counts).

    Only cells actually hit appear (sparse); absent cells are zero.
    d and w are structural — estimate/merge must use the same values.
    """
    _cms_validate(d, w)
    key = _c(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_cell(key, r, w, portable).alias("cell"),
            )
            for r in range(d)
        ]
    )
    wcol = (
        _c(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    exploded = (
        df.filter(key.isNotNull())
        .select(*group_cols, F.explode(pairs).alias("rc"), wcol.alias("__w"))
        .select(
            *group_cols,
            F.col("rc.row").alias("row"),
            F.col("rc.cell").alias("cell"),
            "__w",
        )
    )
    return exploded.groupBy(*group_cols, "row", "cell").agg(
        F.sum("__w").alias("count")
    )


def cms_merge(
    sketch_df: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Fold stored sketch rows (any number of increments, any
    grouping) into one sketch per ``group_cols``: GROUP BY SUM —
    associative and order-independent, so incremental folding is
    drift-free (pinned by tests)."""
    return sketch_df.groupBy(*group_cols, "row", "cell").agg(
        F.sum("count").alias("count")
    )


def cms_estimate(
    sketch_df: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    d: int = 4,
    w: int = 1024,
    portable: bool = False,
    estimate_col: str = "cms_count",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Point-frequency estimates for a candidate key set: re-hash each
    key to its d cells, left-join the sketch (≤ d·w rows per group —
    Spark broadcasts it from AQE size estimation), MIN over the d
    counts.  Keys whose cells were never hit estimate 0.  Output:
    ``group_cols + [key_col, estimate_col]`` (distinct keys).

    With ``group_cols`` the sketch must have been built with the SAME
    grouping and ``keys`` must carry the group columns — each (group,
    key) pair is estimated against its own group's sketch.

    d/w/portable MUST match the build — a mismatch silently hashes
    into the wrong cells, so estimates would still be ≥ 0 but
    meaningless; keep the build parameters with the stored sketch.
    """
    _cms_validate(d, w)
    gcols = list(group_cols)
    key = _c(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_cell(key, r, w, portable).alias("cell"),
            )
            for r in range(d)
        ]
    )
    probes = (
        keys.filter(key.isNotNull())
        .select(*gcols, key.alias(key_col))
        .distinct()
        .select(*gcols, key_col, F.explode(pairs).alias("rc"))
        .select(
            *gcols,
            key_col,
            F.col("rc.row").alias("row"),
            F.col("rc.cell").alias("cell"),
        )
    )
    joined = probes.join(
        sketch_df.select(*gcols, "row", "cell", "count"),
        on=[*gcols, "row", "cell"],
        how="left",
    ).select(
        *gcols, key_col, F.coalesce(F.col("count"), F.lit(0)).alias("__c")
    )
    return joined.groupBy(*gcols, key_col).agg(
        F.min("__c").alias(estimate_col)
    )


__all__ = [
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "approx_distinct",
    "distinct_sketch_table",
    "rollup_sketches",
    "cms_sketch_table",
    "cms_merge",
    "cms_estimate",
]
