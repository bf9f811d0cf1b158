"""Distributed unigram-LM tokenizer training (SentencePiece-style).

The unigram tokenizer (Kudo 2018, "Subword Regularization", §3; the
SentencePiece default) is the other half of the subword-tokenizer
duopoly next to BPE (``operators/bpe.py``): instead of growing a vocab
by merges it starts from a LARGE seed of candidate pieces and prunes
toward the target size, segmenting each word by the highest-scoring
piece decomposition.

This implementation is the HARD-EM (Viterbi) variant: the E-step
assigns every word its single best segmentation and the M-step
re-counts piece usage from those hard assignments.  That is a
deliberate simplification of the paper's full EM (which fractionally
distributes counts over all segmentations via forward-backward), and
it is what makes the trainer fit this repo's reproducibility contract:

* usage counts are INTEGER sums of word frequencies — associative,
  repartition-invariant, engine-portable (the same argument as
  ``kmeans_fit`` / ``bpe_train`` / ``logreg_fit``);
* the DP compares float log-scores, but every score is derived
  deterministically from the integer counts and the comparison
  tie-breaks are total (fewer pieces, then lexicographically smaller
  piece sequence), so any partitioning — and the pure-Python twin in
  tests — reproduces the identical segmentation for every word.

Scale shape (the ``bpe_train`` pattern): the corpus is touched ONCE to
build the distinct-word frequency table; every training round is one
Arrow kernel pass over that VOCAB-sized table (each Arrow batch
segments its words against the piece scores riding in the closure) +
one integer aggregate of (piece, freq) usage rows.  Driver state is
the piece-count dict — bounded by ``seed_size`` (the contract bound,
like k·dim for k-means); nothing corpus-sized ever reaches the driver.
Encoding a 100 TB corpus is one distinct-word aggregate + one kernel
pass over the distinct words + an equi-join back — the corpus side
never runs Python per row.

Reference scope note: the reference system (`/root/reference`, see
SURVEY §2) ships no tokenizer; this module is part of the §2.9
training-data extension surface (X86).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: id emitted for characters that never appeared in training (no piece
#: covers them, so the DP has no path through that position).  For
#: lossless ids use the BPE byte-fallback exporter instead.
UNK_PIECE = "<unk>"


@dataclass(frozen=True)
class UnigramModel:
    """Trained unigram tokenizer: ``pieces[i]`` is the piece string
    with id ``i`` (id 0 is :data:`UNK_PIECE`), ``counts[i]`` its final
    integer usage count.  Bounded driver state (≤ seed_size rows)."""

    pieces: tuple
    counts: tuple

    @property
    def size(self) -> int:
        return len(self.pieces)

    @property
    def max_piece_len(self) -> int:
        """Longest REAL piece (id 0's ``<unk>`` sentinel excluded) —
        the sufficient DP lookahead at encode time: no candidate
        longer than this can ever match, so segmenting with this limit
        reproduces training segmentations even when the model was
        trained with a larger ``max_piece_len`` (the train/encode
        reproducibility contract; derived from the pieces so loaded
        models carry it for free)."""
        return max((len(p) for p in self.pieces[1:]), default=1)

    def scores(self) -> dict:
        """piece → log(count/total) over the non-unk mass (floats
        derived from the integer counts — deterministic)."""
        total = sum(self.counts[1:])
        return {
            p: math.log(c / total)
            for p, c in zip(self.pieces[1:], self.counts[1:])
            if c > 0
        }


def _viterbi(word: str, scores: dict, max_len: int):
    """Best segmentation of ``word`` under piece log-scores.

    DP over end positions; candidate comparison is (score, -n_pieces,
    pieces) — highest score wins, ties prefer FEWER pieces, then the
    lexicographically smaller piece tuple: a total order, so the
    winner is unique and engine/partitioning-independent.  Positions
    no piece can reach are bridged by a single-character <unk> step
    with score -inf-like penalty (so unknown characters never beat a
    real decomposition but never kill the whole word either).
    Returns the piece tuple (unknown characters appear verbatim —
    the caller maps them to the unk id).
    """
    n = len(word)
    NEG = -1e18

    def better(cand, cur) -> bool:
        # the DOCUMENTED total order: higher score, then fewer
        # pieces, then lexicographically SMALLER piece tuple (a plain
        # tuple max would prefer the larger tuple — the divergence a
        # replay implementing the written rule would hit)
        if cur is None:
            return True
        if cand[0] != cur[0]:
            return cand[0] > cur[0]
        if cand[1] != cur[1]:
            return cand[1] > cur[1]
        return cand[2] < cur[2]

    # best[i] = (score, neg_pieces, pieces_tuple) for word[:i]
    best = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(n):
        if best[i] is None:
            continue
        s0, np0, ps0 = best[i]
        hi = min(n, i + max_len)
        for j in range(i + 1, hi + 1):
            piece = word[i:j]
            sc = scores.get(piece)
            if sc is None:
                continue
            cand = (s0 + sc, np0 - 1, ps0 + (piece,))
            if better(cand, best[j]):
                best[j] = cand
        # unk bridge: one character, huge penalty
        cand = (s0 + NEG, np0 - 1, ps0 + (word[i : i + 1],))
        if better(cand, best[i + 1]):
            best[i + 1] = cand
    return best[n][2]


def _viterbi_nbest(word: str, scores: dict, max_len: int, n: int):
    """Top-``n`` segmentations of ``word`` under the SAME total order
    as :func:`_viterbi` (score desc, then fewer pieces, then
    lexicographically smaller piece tuple) — the subword-
    regularization export (Kudo 2018 §4): a trainer samples from the
    n-best list downstream with its own RNG, while the list itself is
    deterministic.  ``n=1`` reproduces :func:`_viterbi` exactly (same
    order, same float accumulation per path).

    DP over end positions keeping the top-``n`` candidate list at each
    position; the <unk> single-character bridge applies only where no
    real piece covers the character (a scored single-character piece
    already yields the identical tuple with a strictly better score,
    so the guard drops only duplicates).  Returns up to ``n``
    ``(logprob, pieces_tuple)`` pairs, best first (fewer when the
    word has fewer distinct segmentations).
    """

    def sort_key(cand):
        # (score desc, fewer pieces, lex-smaller tuple) as an
        # ascending sort key
        return (-cand[0], -cand[1], cand[2])

    # lists of (score, neg_pieces, pieces_tuple), kept sorted, len<=n
    best: list = [[] for _ in range(len(word) + 1)]
    best[0] = [(0.0, 0, ())]
    NEG = -1e18
    for i in range(len(word)):
        if not best[i]:
            continue
        hi = min(len(word), i + max_len)
        for s0, np0, ps0 in best[i]:
            for j in range(i + 1, hi + 1):
                piece = word[i:j]
                sc = scores.get(piece)
                if sc is None:
                    if j == i + 1:
                        sc = NEG  # unk bridge (guarded: not a piece)
                    else:
                        continue
                best[j].append((s0 + sc, np0 - 1, ps0 + (piece,)))
        for j in range(i + 1, hi + 1):
            if len(best[j]) > 1:
                best[j] = sorted(set(best[j]), key=sort_key)[:n]
    return [(c[0], c[2]) for c in best[len(word)]]


def _segment_kernel(scores: dict, max_len: int):
    """mapInPandas kernel: (word, freq) batches → exploded
    (piece, freq) usage rows plus the per-word segmentation."""

    def kernel(batches):
        for pdf in batches:
            words, freqs, segs = [], [], []
            for w, f in zip(pdf["word"], pdf["freq"]):
                seg = _viterbi(w, scores, max_len)
                words.append(w)
                freqs.append(int(f))
                segs.append(list(seg))
            yield pd.DataFrame(
                {"word": words, "freq": freqs, "pieces": segs}
            )

    return kernel


_SEG_SCHEMA = "word string, freq long, pieces array<string>"


def unigram_word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` distinct-word frequency table — the bounded
    state the trainer iterates on (one explode + one hash aggregate,
    the ``bpe_word_table`` shape, without its separator-byte
    restriction)."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def unigram_train(
    words: DataFrame,
    *,
    vocab_size: int,
    n_iter: int = 4,
    max_piece_len: int = 8,
    seed_size: int = 1 << 14,
    min_count: int = 2,
    shrink: float = 0.75,
    word_col: str = "word",
    freq_col: str = "freq",
) -> UnigramModel:
    """Train a unigram tokenizer over a ``(word, freq)`` table.

    1. **Seed**: every substring of every word up to ``max_piece_len``
       chars, counted with multiplicity × word frequency (one explode
       + integer aggregate over the word table); keep the top
       ``seed_size`` by (count DESC, piece ASC) with count ≥
       ``min_count``, plus ALL single characters unconditionally (the
       coverage floor — any training word stays segmentable).
    2. **Rounds** (hard EM): segment every word by Viterbi under the
       current counts (one Arrow pass over the word table), re-count
       pieces as integer Σ word-freq (one aggregate, one bounded
       collect), then PRUNE: drop unused multi-char pieces and keep
       the top ``max(vocab_size, ⌈|V|·shrink⌉)`` multi-char pieces —
       the paper's gradual shrink toward the target, re-fitting
       between cuts instead of one brutal truncation.
    3. **Finalize** at exactly ``vocab_size`` pieces (single chars
       always survive; if ``vocab_size`` cannot hold the alphabet,
       that is an error — coverage beats the target).

    Returns a :class:`UnigramModel` with id 0 = ``<unk>`` and ids
    assigned by (final count DESC, piece ASC) — deterministic.
    """
    if vocab_size < 2:
        raise ValueError("unigram_train: vocab_size must be >= 2")
    if not 1 <= n_iter <= 50:
        raise ValueError("unigram_train: n_iter must be in [1, 50]")
    if not 0.1 <= shrink <= 1.0:
        raise ValueError("unigram_train: shrink must be in [0.1, 1.0]")
    if max_piece_len < 1:
        raise ValueError("unigram_train: max_piece_len must be >= 1")
    w = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
    ).filter(F.col("word") != "")
    # one localCheckpoint: the seed explode and every round re-read
    # this vocab-sized frame
    state = w.localCheckpoint(eager=True)

    subs = F.expr(
        "flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(i, least(length(word), i + {max_piece_len}"
        " - 1)), j -> substring(word, i, j - i + 1))))"
    )
    seeded = (
        state.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        # two collects read this (alphabet + top multis) and the
        # substring explode is the heaviest job in training — persist
        # so it runs once
        .persist()
    )
    chars = {
        r["piece"]: int(r["cnt"])
        for r in seeded.filter(F.length("piece") == 1).collect()
    }
    if len(chars) + 1 > vocab_size:
        raise ValueError(
            f"unigram_train: vocab_size={vocab_size} cannot hold the "
            f"{len(chars)}-char alphabet + <unk> — coverage beats the "
            "target, raise vocab_size"
        )
    multi = (
        seeded.filter(
            (F.length("piece") > 1) & (F.col("cnt") >= min_count)
        )
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(max(0, seed_size - len(chars)))
        .collect()
    )
    counts = dict(chars)
    counts.update({r["piece"]: int(r["cnt"]) for r in multi})
    seeded.unpersist()

    def prune(counts: dict, keep_multi: int) -> dict:
        multis = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1 and c > 0),
            key=lambda x: (-x[1], x[0]),
        )[: max(0, keep_multi)]
        out = {p: c for p, c in counts.items() if len(p) == 1}
        out.update(dict(multis))
        return out

    n_chars = len(chars)
    for it in range(n_iter):
        total = sum(counts.values())
        scores = {
            p: math.log(c / total) for p, c in counts.items() if c > 0
        }
        seg = state.mapInPandas(
            _segment_kernel(scores, max_piece_len), _SEG_SCHEMA
        )
        used = (
            seg.select(F.explode("pieces").alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()
        )
        new_counts = {
            r["piece"]: int(r["cnt"])
            for r in used
            if r["piece"] in counts  # unk bridges stay out
        }
        # single chars always survive, even at usage 0 (coverage)
        for ch, c0 in chars.items():
            new_counts.setdefault(ch, 0)
        n_multi_target = max(
            vocab_size - 1 - n_chars,
            math.ceil(
                sum(1 for p in new_counts if len(p) > 1)
                * (shrink if it < n_iter - 1 else 0.0)
            ),
        )
        counts = prune(new_counts, n_multi_target)

    ordered = sorted(
        counts.items(), key=lambda x: (-x[1], x[0])
    )[: vocab_size - 1]
    # re-add any single char the cut dropped (coverage floor)
    kept = {p for p, _ in ordered}
    for ch in chars:
        if ch not in kept:
            ordered.append((ch, counts.get(ch, 0)))
    ordered = sorted(ordered, key=lambda x: (-x[1], x[0]))
    pieces = (UNK_PIECE,) + tuple(p for p, _ in ordered)
    cnts = (0,) + tuple(int(c) for _, c in ordered)
    return UnigramModel(pieces=pieces, counts=cnts)


def unigram_segment_words(
    words: DataFrame,
    model: UnigramModel,
    *,
    word_col: str = "word",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Segment a column of (distinct) words under a trained model:
    ``(word, pieces array<string>, ids array<int>)``.  One Arrow pass;
    characters outside the model map to id 0 (<unk>).
    ``max_piece_len`` defaults to the model's own longest piece — a
    smaller explicit value silently truncates matchable pieces, so
    only override it to REDUCE DP work when the vocab is known short.
    """
    if max_piece_len is None:
        max_piece_len = model.max_piece_len
    scores = model.scores()
    piece_id = {p: i for i, p in enumerate(model.pieces)}

    def kernel(batches):
        for pdf in batches:
            out_w, out_p, out_i = [], [], []
            for w in pdf["word"]:
                seg = _viterbi(w, scores, max_piece_len)
                out_w.append(w)
                out_p.append(list(seg))
                out_i.append([piece_id.get(p, 0) for p in seg])
            yield pd.DataFrame(
                {"word": out_w, "pieces": out_p, "ids": out_i}
            )

    return words.select(
        F.col(word_col).alias("word")
    ).distinct().mapInPandas(
        kernel, "word string, pieces array<string>, ids array<int>"
    )


def unigram_nbest_segment_words(
    words: DataFrame,
    model: UnigramModel,
    *,
    n: int = 5,
    word_col: str = "word",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Top-``n`` segmentations per distinct word — the subword-
    regularization export (r12, VERDICT r11 task 6; Kudo 2018 §4):
    ``(word, segs array<array<string>>, ids array<array<int>>,
    logprobs array<double>)``, best first, deterministic (the
    candidate order is total), so a trainer samples from the list
    downstream with its own RNG while the engine side stays
    replayable.  ``segs[0]`` always equals
    :func:`unigram_segment_words`'s single-best pieces.  One Arrow
    pass over the vocab-sized distinct-word frame, like every other
    unigram kernel; a segmentation that crosses an unknown character
    carries the unk bridge's −1e18 penalty in its logprob.
    """
    if n < 1:
        raise ValueError("unigram_nbest_segment_words: n must be >= 1")
    if max_piece_len is None:
        max_piece_len = model.max_piece_len
    scores = model.scores()
    piece_id = {p: i for i, p in enumerate(model.pieces)}

    def kernel(batches):
        for pdf in batches:
            out_w, out_s, out_i, out_lp = [], [], [], []
            for w in pdf["word"]:
                cands = _viterbi_nbest(w, scores, max_piece_len, n)
                out_w.append(w)
                out_s.append([list(ps) for _, ps in cands])
                out_i.append(
                    [[piece_id.get(p, 0) for p in ps] for _, ps in cands]
                )
                out_lp.append([float(lp) for lp, _ in cands])
            yield pd.DataFrame(
                {
                    "word": out_w,
                    "segs": out_s,
                    "ids": out_i,
                    "logprobs": out_lp,
                }
            )

    return words.select(
        F.col(word_col).alias("word")
    ).distinct().mapInPandas(
        kernel,
        "word string, segs array<array<string>>, "
        "ids array<array<int>>, logprobs array<double>",
    )


def unigram_encode(
    df: DataFrame,
    model: UnigramModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "ids",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Encode a corpus to unigram token ids: ``(id_col, out_col)``.

    The Python DP runs over the corpus's DISTINCT words only (one
    aggregate + one Arrow pass, vocabulary-sized); the corpus side is
    tokenize → explode with position → equi-join the word→ids map →
    re-assemble in order (one shuffle of (doc, pos, word-id) rows) —
    the standard decoupling that keeps per-row Python OFF the 100 TB
    path.  Documents with no tokens yield an empty array.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda t: t != ""
            )
        ).alias("__pos", "word"),
    )
    seg = unigram_segment_words(
        toks.select("word"), model, max_piece_len=max_piece_len
    )
    joined = toks.join(seg.select("word", "ids"), on="word")
    assembled = joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__pos"), F.col("ids"))
                    )
                ),
                lambda s: s["ids"],
            )
        ).alias(out_col)
    )
    base = df.select(id_col)
    return base.join(assembled, on=id_col, how="left").select(
        id_col,
        F.coalesce(
            F.col(out_col), F.array().cast("array<int>")
        ).alias(out_col),
    )


def save_unigram_model(spark, model: UnigramModel, table: str) -> None:
    """Persist as an id-ordered table ``(id, piece, cnt)`` — train
    once, encode daily (the save_kmeans_model contract)."""
    rows = [
        (i, p, int(c))
        for i, (p, c) in enumerate(zip(model.pieces, model.counts))
    ]
    spark.createDataFrame(
        rows, "id int, piece string, cnt long"
    ).write.mode("overwrite").saveAsTable(table)


def load_unigram_model(spark, table: str) -> UnigramModel:
    rows = sorted(spark.table(table).collect(), key=lambda r: r["id"])
    if not rows or rows[0]["piece"] != UNK_PIECE:
        raise ValueError(
            f"load_unigram_model: {table} is not a save_unigram_model "
            "table (id 0 must be <unk>)"
        )
    if [r["id"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"load_unigram_model: {table} ids are not 0..n-1"
        )
    return UnigramModel(
        pieces=tuple(r["piece"] for r in rows),
        counts=tuple(int(r["cnt"]) for r in rows),
    )


__all__ = [
    "UNK_PIECE",
    "UnigramModel",
    "unigram_word_table",
    "unigram_train",
    "unigram_segment_words",
    "unigram_nbest_segment_words",
    "unigram_encode",
    "save_unigram_model",
    "load_unigram_model",
]
