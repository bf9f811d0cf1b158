"""Train/eval decontamination: n-gram overlap against a benchmark set.

The training-pipeline operator the reference has no analogue for (it is
part of the §2.9 LLM-data surface): before training, every document
that shares word n-grams with an evaluation benchmark must be flagged
(and usually dropped), or downstream eval numbers are meaningless.
The standard recipe is exact n-gram collision at n≈8-13 words.

Scale shape (the part that matters at 100 TB):

* The eval side is small (benchmarks are 1e3-1e6 documents).  Its
  DISTINCT n-gram set is aggregated once and **broadcast**, so the
  training corpus — the 100 TB side — is scanned exactly once with a
  map-side hash join and never shuffles its text.
* With ``hash_grams=True`` (default) grams join as ``xxhash64`` longs:
  the broadcast table carries 8-byte keys instead of n-word strings
  (~10x smaller), and the probe side hashes each gram inline in
  codegen.  Collisions at 64 bits are ~n²/2⁶⁵ — for a 1e8-gram eval
  set that is ~1e-4 expected false collisions corpus-wide.
* Per-document totals (``n_grams``) are per-row expressions over the
  row's own text — no extra shuffle; the only aggregation is over the
  *matching* grams, which is output-sized, not corpus-sized.
* For eval sets too big to broadcast, pass ``broadcast_eval=False``:
  the join becomes a regular shuffled hash join on the 8-byte gram
  key — still payload-free (ids and longs only).

No reference counterpart (datatoolz core is IO/filtering); included as
part of the training-data extension surface alongside dedup/sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    """Maximal ``[a-z0-9]+`` runs of the lowercased text (ANSI-SQL
    reproducible: DuckDB's ``regexp_extract_all`` has identical
    semantics, which is what makes the qid oracle exact)."""
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)


def _grams_of_words_ordered(words: Column, n: int) -> Column:
    """Word n-grams IN POSITION ORDER (gram ``i`` starts at word index
    ``i``); a document with fewer than ``n`` words yields an empty
    array.  The ONE canonical gram builder — decontamination, span
    dedup, and chunk-free consumers all derive from it, so the hashed
    gram space stays bit-stable across every operator that joins on it.

    Built as ``n-1`` chained ``zip_with`` concat passes over shifted
    copies of the array (truncated to the ``L-n+1`` complete grams)
    rather than a per-position ``slice``+``array_join`` transform —
    same O(L·n) work, but each pass is one vectorized sweep instead of
    an n-element array allocation per position: measured 2.7x faster
    at sf0.1 with bit-identical output.
    """
    g = words
    for k in range(1, n):
        shifted = F.slice(
            words, k + 1, F.greatest(F.size(words) - F.lit(k), F.lit(0))
        )
        # zip_with pads the shorter side with NULL and concat_ws skips
        # NULLs, so tail entries hold partial grams — the final slice
        # keeps only the L-n+1 complete ones
        g = F.zip_with(g, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(
        F.size(words) >= n, F.slice(g, 1, F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def _grams_of_words(words: Column, n: int) -> Column:
    """DISTINCT word n-grams (order-free set form of
    :func:`_grams_of_words_ordered`)."""
    return F.array_distinct(_grams_of_words_ordered(words, n))


def _word_grams(text: Column, n: int) -> Column:
    """DISTINCT word n-grams of a text column, as an array<string>.

    One-shot expression form — fine when the result feeds exactly ONE
    consumer (e.g. a bare explode).  When both the array and a derived
    value (size) are needed, stage the array through its own projection
    first (see :func:`ngram_decontaminate`): Catalyst re-derives a
    single-use alias from its input columns past a Generate, which
    re-evaluates this whole O(words²) expression per EXPLODED row — a
    200x wall-time cliff measured at sf0.1.  A non-cheap alias
    referenced more than once is left materialized (CollapseProject's
    reference-count guard), which is what the staged form relies on.
    """
    return _grams_of_words(_words(text), n)


def eval_gram_set(
    eval_df: DataFrame,
    text_col: str = "text",
    *,
    n: int = 8,
    hash_grams: bool = True,
) -> DataFrame:
    """One-column frame of the eval set's distinct n-grams.

    Materialize this once per benchmark release and reuse it across
    decontamination runs — the expensive side of the check is the
    corpus scan, not this.
    """
    staged = eval_df.select(
        _words(F.col(text_col)).alias("__w")
    ).select(_grams_of_words(F.col("__w"), n).alias("__grams"))
    # outer + null-drop for the same InferFiltersFromGenerate reason
    # as ngram_decontaminate below (smaller frame, same 2x shape)
    grams = (
        staged.select(F.explode_outer("__grams").alias("__gram"))
        .filter(F.col("__gram").isNotNull())
        .distinct()
    )
    if hash_grams:
        grams = grams.select(F.xxhash64("__gram").alias("__gram"))
    return grams


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
    hash_grams: bool = True,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training documents sharing word ``n``-grams with an eval set.

    Returns ``(id_col, n_hits, n_grams, hit_ratio)`` for documents with
    at least ``min_hits`` distinct colliding n-grams — ``n_hits`` is the
    number of the document's DISTINCT n-grams that appear anywhere in
    the eval set, ``n_grams`` its total distinct n-gram count, and
    ``hit_ratio`` their quotient.  Dropping is the caller's policy
    (left_anti on the returned ids); reporting and dropping are
    separate so audits can see *why* a document left the corpus.
    """
    ev = eval_gram_set(
        eval_df, eval_text_col or text_col, n=n, hash_grams=hash_grams
    )
    if broadcast_eval:
        ev = F.broadcast(ev)

    # Stage words, then grams, as their own projections: each alias is
    # non-cheap and referenced more than once downstream, so Catalyst
    # materializes it once per row instead of re-deriving the full
    # expression per EXPLODED row above the Generate (a measured 200x
    # cliff at sf0.1 — see _word_grams docstring).
    staged = train.select(
        F.col(id_col), _words(F.col(text_col)).alias("__w")
    ).select(
        F.col(id_col), _grams_of_words(F.col("__w"), n).alias("__grams")
    )
    # explode_OUTER + null filter, not plain explode:
    # InferFiltersFromGenerate would add ``size(__grams) > 0`` and
    # push it below the staged projections, re-inlining the whole
    # gram chain into a Filter that evaluates per INPUT row — the
    # same cliff the staging exists to avoid, reintroduced from the
    # side (see remove_duplicate_spans; measured 4x there).
    exploded = staged.select(
        F.col(id_col),
        F.size("__grams").alias("n_grams"),
        F.explode_outer("__grams").alias("__gram"),
    ).filter(F.col("__gram").isNotNull())
    if hash_grams:
        exploded = exploded.withColumn("__gram", F.xxhash64("__gram"))
    # grams are distinct per document, so count(*) after the join IS
    # the distinct-collision count — no countDistinct shuffle needed
    return (
        exploded.join(ev, on="__gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
        .select(
            id_col,
            "n_hits",
            "n_grams",
            (F.col("n_hits") / F.col("n_grams")).alias("hit_ratio"),
        )
    )


def decontaminated(
    train: DataFrame,
    eval_df: DataFrame,
    **kwargs,
) -> DataFrame:
    """The corpus minus contaminated documents (left_anti on the flags)."""
    id_col = kwargs.get("id_col", "doc_id")
    flags = ngram_decontaminate(train, eval_df, **kwargs).select(id_col)
    return train.join(flags, on=id_col, how="left_anti")


def embedding_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    eval_vec_col: str | None = None,
    threshold: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """Semantic decontamination: flag corpus rows whose embedding is
    within cosine ``threshold`` of ANY benchmark item — the
    paraphrase-robust complement of :func:`ngram_decontaminate`
    (n-gram collision misses reworded eval leakage; SemDeDup-style
    cosine matching catches it).

    Scale shape mirrors the n-gram path: the eval side is the small
    one, so its unit-normalized matrix ships to executors inside the
    kernel closure (a (|eval| × dim) float64 block — ~50 MB per 1e5
    items at dim=64; for bigger eval sets shard eval_df and union the
    flags).  The 100 TB corpus is scanned EXACTLY ONCE with no
    shuffle: per Arrow batch one ``(batch × dim) @ (dim × |eval|)``
    matmul yields every corpus-eval cosine, and only (max_cosine,
    argmax eval id) per row survive.  Output: ``id_col,
    nearest_eval_id, max_cosine`` for flagged rows only (cosine
    rounded 6 — cross-engine reproducible, same contract as
    ``cosine_topk``).

    Zero/NULL vectors never flag (no direction to match).
    """
    import numpy as np
    import pandas as pd

    eval_id_col = eval_id_col or id_col
    eval_vec_col = eval_vec_col or vec_col
    ev_id_type = eval_df.schema[eval_id_col].dataType.simpleString()
    corp_id_type = corpus.schema[id_col].dataType.simpleString()
    # ordered by id so argmax's first-maximum tie-break is a stable
    # "lowest eval id", independent of eval_df's physical layout
    ev_rows = (
        eval_df.select(eval_id_col, eval_vec_col)
        .orderBy(eval_id_col)
        .collect()
    )
    ev_ids: list = []
    ev_vecs: list = []
    for r in ev_rows:
        v = r[eval_vec_col]
        if v is None:
            continue
        arr = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(arr)
        if n == 0:
            continue
        ev_ids.append(r[eval_id_col])
        ev_vecs.append(arr / n)
    if not ev_vecs:
        return (
            corpus.select(
                F.col(id_col),
                F.lit(None).cast(ev_id_type).alias("nearest_eval_id"),
                F.lit(0.0).alias("max_cosine"),
            ).filter(F.lit(False))
        )
    ev_mat = np.vstack(ev_vecs).T  # (dim, n_eval)

    out_schema = (
        f"{id_col} {corp_id_type}, nearest_eval_id {ev_id_type}, "
        "max_cosine double"
    )

    def flag_batches(batches):
        # mapInPandas (not a scalar UDF): the output is already
        # FILTERED to flagged rows inside the kernel, so at a sane
        # threshold almost nothing leaves the scan stage
        for pdf in batches:
            vals = pdf["__v"].tolist()
            ids = pdf[id_col].to_numpy()
            live = [i for i, v in enumerate(vals) if v is not None]
            if not live:
                continue
            mat = np.vstack(
                [np.asarray(vals[i], dtype=np.float64) for i in live]
            )
            norms = np.linalg.norm(mat, axis=1)
            ok = norms > 0
            mat[ok] = mat[ok] / norms[ok, None]
            sims = mat @ ev_mat  # (batch, n_eval)
            best = sims.argmax(axis=1)
            best_sim = np.round(sims[np.arange(len(live)), best], 6)
            keep = ok & (best_sim >= threshold)
            if not keep.any():
                continue
            rows = np.flatnonzero(keep)
            yield pd.DataFrame(
                {
                    id_col: [ids[live[j]] for j in rows],
                    "nearest_eval_id": [
                        ev_ids[int(best[j])] for j in rows
                    ],
                    "max_cosine": [float(best_sim[j]) for j in rows],
                }
            )

    return corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).mapInPandas(flag_batches, out_schema)


__all__ = [
    "eval_gram_set",
    "ngram_decontaminate",
    "decontaminated",
    "embedding_decontaminate",
]
