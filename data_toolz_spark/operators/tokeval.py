"""Tokenizer evaluation: fertility / compression / UNK rate across
the three trained tokenizer families (X93).

Choosing a tokenizer for a training run is a measured decision —
the standard criteria (e.g. Rust et al. 2021, "How Good is Your
Tokenizer?") are

* **fertility** — pieces per word (lower = fewer tokens to learn the
  same text, cheaper training);
* **compression** — characters per piece (higher = each token carries
  more signal);
* **UNK rate** — the frequency-weighted share of words the tokenizer
  cannot represent (WordPiece collapses unmatched words to ``[UNK]``;
  unigram bridges unknown characters with id 0; byte-free BPE can
  leave untrained characters as singleton symbols but never drops
  them).

All three tokenizers segment DISTINCT words, so the whole evaluation
is frequency-weighted arithmetic over the vocab-sized word table —
the corpus is never touched (build the table once with
:func:`bpe.bpe_word_table`; at 100 TB that is the one corpus-wide
aggregate everything tokenizer-side already shares).  Per family:
one Arrow kernel pass (WordPiece / unigram) or one codegen'd
expression (BPE) over the distinct words, then a single weighted
aggregate.  Output is one row per (group, tokenizer) — bounded by
|groups| x 3.

Reference scope note: the reference system ships no tokenizer; this
module is §2.9 extension surface (X93), composing X61 (BPE), X86
(unigram) and X92 (WordPiece).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_toolz_spark.operators.bpe import (
    BPE_SEP,
    bpe_token_count_expr,
)
from data_toolz_spark.operators.unigram import UnigramModel
from data_toolz_spark.operators.wordpiece import (
    WP_UNK,
    wordpiece_segment_words,
)


def tokenizer_eval(
    words: DataFrame,
    *,
    bpe_merges: list[dict] | None = None,
    wp_vocab: dict[str, int] | None = None,
    unigram_model: UnigramModel | None = None,
    word_col: str = "word",
    freq_col: str = "freq",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Frequency-weighted tokenizer quality metrics over a word table.

    Pass any subset of the three trained models; the output has one
    row per (``group_cols``…, ``tokenizer``) with

    * ``n_words`` — Σ freq (word instances represented),
    * ``n_pieces`` — Σ freq·pieces(word),
    * ``fertility`` — pieces per word,
    * ``chars_per_piece`` — Σ freq·len(word) / Σ freq·pieces(word),
    * ``unk_rate`` — Σ freq·[word has an UNK piece] / Σ freq
      (0.0 for BPE: char-seeded merges keep every trained character
      representable, and untrained characters surface as singleton
      symbols, not drops — use the byte-fallback exporter for
      lossless ids).

    Floats are ROUND()ed to 6 decimals (the repo's cross-engine
    float contract).  ``group_cols`` lets a per-language word table
    (word, freq, lang) report per-language metrics — the aggregate
    stays one hash aggregate either way.
    """
    if bpe_merges is None and wp_vocab is None and unigram_model is None:
        raise ValueError(
            "tokenizer_eval: pass at least one of bpe_merges, "
            "wp_vocab, unigram_model"
        )
    gcols = list(group_cols or [])
    base = words.select(
        *gcols,
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
    )
    frames: list[DataFrame] = []

    def finish(per_word: DataFrame, name: str) -> DataFrame:
        agg = per_word.groupBy(*gcols).agg(
            F.sum("freq").alias("n_words"),
            F.sum(F.col("freq") * F.col("pieces")).alias("n_pieces"),
            F.sum(F.col("freq") * F.length("word")).alias("n_chars"),
            F.sum(F.col("freq") * F.col("is_unk").cast("long")).alias(
                "n_unk"
            ),
        )
        return agg.select(
            *gcols,
            F.lit(name).alias("tokenizer"),
            F.col("n_words"),
            F.col("n_pieces"),
            F.round(
                F.col("n_pieces") / F.col("n_words").cast("double"), 6
            ).alias("fertility"),
            F.round(
                F.col("n_chars") / F.col("n_pieces").cast("double"), 6
            ).alias("chars_per_piece"),
            F.round(
                F.col("n_unk") / F.col("n_words").cast("double"), 6
            ).alias("unk_rate"),
        )

    if bpe_merges is not None:
        per = base.select(
            *gcols,
            "word",
            "freq",
            bpe_token_count_expr("word", bpe_merges).alias("pieces"),
            F.lit(False).alias("is_unk"),
        )
        frames.append(finish(per, "bpe"))
    if wp_vocab is not None:
        seg = wordpiece_segment_words(
            base.select("word"), wp_vocab
        ).select(
            "word",
            F.col("n_pieces").cast("long").alias("pieces"),
            (F.col("pieces")[0] == WP_UNK).alias("is_unk"),
        )
        per = base.join(seg, on="word")
        frames.append(finish(per, "wordpiece"))
    if unigram_model is not None:
        from data_toolz_spark.operators.unigram import (
            unigram_segment_words,
        )

        seg = unigram_segment_words(
            base.select("word"), unigram_model
        ).select(
            "word",
            F.size("ids").cast("long").alias("pieces"),
            F.array_contains("ids", 0).alias("is_unk"),
        )
        per = base.join(seg, on="word")
        frames.append(finish(per, "unigram"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


__all__ = ["tokenizer_eval"]
