"""Distributed BPE-merge training (Sennrich et al. 2016).

The one tokenizer-side operator a training-data pipeline needs that
token COUNTING (``functions/text.py``) doesn't give: LEARN a merge
vocabulary from the corpus.  The classic algorithm is inherently
sequential in the merge rank, so the distributed shape is:

* state = the DISTINCT-WORD frequency table (vocab-sized, not
  corpus-sized — the only thing that ever shuffles), each word
  encoded as a separator-wrapped symbol string
  (``⟦h⟧⟦e⟧⟦l⟧⟦l⟧⟦o⟧`` with ``⟦⟧`` = ``chr(31)``);
* per merge: ONE hash aggregate over exploded adjacent symbol pairs
  (weighted by word frequency) → the argmax row (count DESC, left
  ASC, right ASC — deterministic ties) is the ONLY thing that
  crosses to the driver;
* the merge applies as a LITERAL string replace of
  ``⟦l⟧⟦r⟧ → ⟦lr⟧`` — non-overlapping left-to-right, which IS the
  BPE greedy-scan semantics (``aaa`` + merge (a,a) → ``aa a``), and
  the double-separator wrapping means adjacent occurrences share no
  boundary characters, so plain ``replace`` finds them all;
* ``localCheckpoint`` after every merge keeps the plan flat (33
  nested replaces otherwise accumulate in the lineage) — the
  materialized state is vocab-sized by construction.

Everything is deterministic relational string arithmetic: an ANSI-SQL
engine replays the whole training loop (pair counts, argmax, replace
chain) bit for bit — the driver qid's oracle does exactly that with
one CTE pair per merge rank.

Scale: at 100 TB the word table is the aggregated vocabulary (built
once with one corpus-wide shuffle); each of the K merges is a
vocab-sized aggregate with one driver row — K × O(|vocab|) total,
never K × O(corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: symbol separator (unit separator — absent from natural text; words
#: containing it are dropped by bpe_word_table to keep the encoding
#: unambiguous)
BPE_SEP = "\x1f"


def bpe_word_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(word, freq)`` distinct-word frequency table — the bounded
    state BPE training iterates on.  One explode + one hash aggregate;
    words containing the separator byte are dropped (they would make
    the symbol encoding ambiguous)."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter((F.col("word") != "") & ~F.col("word").contains(BPE_SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _encode_word(col: Column, sep: str) -> Column:
    """Word → separator-wrapped symbol string: each initial symbol is
    one character, rendered ``sep + ch + sep``."""
    return F.regexp_replace(col, "(.)", sep + "$1" + sep)


def _symbols(state_col: Column, sep: str) -> Column:
    """Symbol array from an encoded state string: strip the outer
    separators, split on the doubled separator."""
    inner = F.substring(state_col, 2, F.length(state_col) - 2)
    return F.split(inner, sep + sep)


def bpe_train(
    words: DataFrame,
    *,
    n_merges: int,
    min_count: int = 2,
    word_col: str = "word",
    freq_col: str = "freq",
    sep: str = BPE_SEP,
) -> list[dict]:
    """Learn up to ``n_merges`` BPE merges from a word-frequency table.

    Returns ``[{"rank", "left", "right", "merged", "pair_count"}, …]``
    in merge order; stops early when no adjacent pair reaches
    ``min_count`` (the state is then a fixed point — retrying cannot
    change it, which is what lets a SQL replay keep iterating with
    empty-selection guards and stay equivalent).  Pair counting
    follows Sennrich: every adjacent occurrence counts, weighted by
    word frequency, overlaps included (``aaa`` contributes (a,a)
    twice).
    """
    state = words.select(
        _encode_word(F.col(word_col), sep).alias("s"),
        F.col(freq_col).alias("f"),
    )
    # right-size the iteration state: the loop runs K tiny jobs over a
    # VOCAB-sized frame, and scheduling 32 near-empty tasks per job is
    # pure overhead (measured 15.6 s → ~4 s at sf0.1's ~60-word vocab).
    # One count() prices the state, then ~4k words/partition keeps a
    # billion-word 100 TB vocab at cluster parallelism while a demo
    # vocab collapses to one task per stage.
    n_rows = state.count()
    state = state.coalesce(
        max(1, min(state.rdd.getNumPartitions(), n_rows // 4096 + 1))
    ).localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(n_merges):
        syms = _symbols(F.col("s"), sep)
        idx = F.when(
            F.size(syms) >= 2, F.sequence(F.lit(0), F.size(syms) - 2)
        ).otherwise(F.array().cast("array<int>"))
        prs = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(syms, i + 1).alias("l"),
                F.element_at(syms, i + 2).alias("r"),
            ),
        )
        best = (
            state.select(F.explode(prs).alias("p"), "f")
            .groupBy("p.l", "p.r")
            .agg(F.sum("f").alias("cnt"))
            .filter(F.col("cnt") >= min_count)
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append(
            {
                "rank": rank,
                "left": l,
                "right": r,
                "merged": l + r,
                "pair_count": cnt,
            }
        )
        prev = state
        # lazy checkpoint: materializes inside the NEXT iteration's
        # aggregate job instead of paying its own job — halves the
        # per-rank job count while still keeping the plan flat
        state = state.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(sep + l + sep + sep + r + sep),
                F.lit(sep + l + r + sep),
            ),
        ).localCheckpoint(eager=False)
        prev.unpersist()
    state.unpersist()
    return merges


def bpe_apply_expr(
    word: Column, merges: list[dict], *, sep: str = BPE_SEP
) -> Column:
    """Encoded-state column for ``word`` after applying ``merges`` in
    rank order — the same literal replaces training used, so encode ∘
    apply is exactly the trained segmentation."""
    e = _encode_word(word, sep)
    for m in merges:
        e = F.replace(
            e,
            F.lit(sep + m["left"] + sep + sep + m["right"] + sep),
            F.lit(sep + m["merged"] + sep),
        )
    return e


def bpe_token_count_expr(
    text_col: Column | str, merges: list[dict], *, sep: str = BPE_SEP
) -> Column:
    """Per-document token count under a TRAINED merge list: split to
    words, apply the merges to each, count symbols (= separator pairs)
    — all codegen'd string expressions, the merge table rides in the
    plan as literals (it is driver-bounded by construction: one row
    per merge)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(
        F.split(col, r"\s+"),
        lambda w: (w != "") & ~w.contains(sep),
    )
    counts = F.transform(
        words,
        lambda w: F.size(
            _symbols(bpe_apply_expr(w, merges, sep=sep), sep)
        ).cast("long"),
    )
    return F.coalesce(
        F.aggregate(
            counts, F.lit(0).cast("long"), lambda acc, x: acc + x
        ),
        F.lit(0).cast("long"),
    )


def bpe_base_chars(word_table: DataFrame) -> list[str]:
    """Sorted distinct single characters of the training word table —
    the base alphabet the id space starts from.  One explode + distinct
    aggregate; alphabet-sized driver state (bounded like the merges)."""
    rows = (
        word_table.select(
            F.explode(F.split(F.col("word"), "(?!^)(?=.)")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    return sorted(r["ch"] for r in rows)


def bpe_vocab(
    merges: list[dict], base_chars: list[str]
) -> dict[str, int]:
    """Symbol → token-id map: base characters take ids 0..B−1 in
    sorted order, merge ``rank`` takes id B + rank — the standard BPE
    id convention (deterministic given the training corpus + K)."""
    vocab = {ch: i for i, ch in enumerate(sorted(base_chars))}
    b = len(vocab)
    for m in merges:
        vocab[m["merged"]] = b + int(m["rank"])
    return vocab


def bpe_encode_expr(
    text_col: Column | str,
    merges: list[dict],
    vocab: dict[str, int],
    *,
    sep: str = BPE_SEP,
    unk_id: int = -1,
) -> Column:
    """Token-id ARRAY per document under a trained merge list — the
    export surface a tokenization pipeline hands to training
    (``input_ids``).  Words apply the same literal replace chain
    training used, symbols look up in a LITERAL map (vocab-sized —
    driver-bounded like the merge list), out-of-alphabet symbols get
    ``unk_id``.  All codegen'd expressions: encoding a 100 TB corpus
    rides the scan with zero UDFs and no shuffle.
    """
    if not vocab:
        raise ValueError("bpe_encode_expr: empty vocab")
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    keys, vals = zip(*sorted(vocab.items()))
    vmap = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.lit(int(v)) for v in vals]),
    )
    words = F.filter(
        F.split(col, r"\s+"),
        lambda w: (w != "") & ~w.contains(sep),
    )
    per_word = F.transform(
        words,
        lambda w: F.transform(
            _symbols(bpe_apply_expr(w, merges, sep=sep), sep),
            lambda s: F.coalesce(
                F.element_at(vmap, s), F.lit(int(unk_id))
            ),
        ),
    )
    return F.flatten(per_word)


__all__ = [
    "BPE_SEP",
    "bpe_word_table",
    "bpe_train",
    "bpe_apply_expr",
    "bpe_token_count_expr",
    "bpe_base_chars",
    "bpe_vocab",
    "bpe_encode_expr",
]
