"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting.

Every formula is deliberately ANSI-SQL-expressible (same tokenizer, same
arithmetic) so results are value-checkable against any SQL oracle — the
operators are *real* heuristics, just reproducible ones.  All JVM-side;
no Python UDFs.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_toolz_spark.functions.text import (
    normalized_text,
    text_fingerprint,
    token_count,
    tokens,
)
from data_toolz_spark.operators._util import spread

# Small function-word lists per language; ordered dict order is the
# deterministic argmax tie-break order.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "los", "las", "y", "es", "de", "que"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "que"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}


def _stopword_ratio(toks: Column, words: tuple[str, ...]) -> Column:
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in words]))
    )
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast(
        "double"
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "lang_pred",
) -> DataFrame:
    """Stopword-overlap language ID with deterministic tie-breaking.

    score(lang) = |tokens ∩ stopwords(lang)| / |tokens|; prediction is
    the first language (in STOPWORDS key order) achieving the maximum
    score.  A real deployment swaps in a character-n-gram model; the
    operator shape (per-row scoring + argmax) is identical.
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    scores = {
        lang: _stopword_ratio(toks, words) for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    # build the when-chain in reverse so the FIRST lang wins ties
    for lang in reversed(list(scores)):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


def quality_features(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-document quality signals + composite score.

    Features (all reproducible in ANSI SQL):
      n_tokens      — whitespace token count
      mean_tok_len  — avg token length
      alpha_ratio   — alphabetic chars / total chars
      stop_ratio    — English stopword token ratio
      quality_score — 0..1 composite (length-normalized, penalizes
                      outlier token lengths and non-alpha noise)
    """
    # the feature chain is pure per-row compute (tokenize + regex +
    # array aggregate); a narrow input (one parquet split locally, an
    # AQE-coalesced stage on a cluster) pins it to one core.  spread()
    # widens only below defaultParallelism — no-op on wide inputs.
    df = spread(df)
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks).cast("double")
    text_len = F.length(F.col(text_col)).cast("double")
    alpha_len = F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z]", "")
    ).cast("double")
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    stop_ratio = _stopword_ratio(toks, STOPWORDS["en"])
    # composite: saturating length term × token-shape term × alpha term
    length_term = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    shape_term = F.when(
        (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    alpha_term = F.when(text_len > 0, alpha_len / text_len).otherwise(
        F.lit(0.0)
    )
    # 4-decimal TRUNCATION, not round(): ratios with small denominators
    # land on exact shortest-decimal .5 boundaries (e.g. 0.59925) where
    # Spark's round (via the shortest decimal string) and a binary
    # rounder disagree; floor of the identical double is engine-stable.
    def trunc4(col: Column) -> Column:
        return F.floor(col * 10000) / F.lit(10000.0)

    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("mean_tok_len", trunc4(mean_tok_len))
        .withColumn("alpha_ratio", trunc4(alpha_term))
        .withColumn("stop_ratio", trunc4(stop_ratio))
        .withColumn(
            "quality_score",
            trunc4(length_term * shape_term * alpha_term),
        )
    )


def token_stats(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Corpus token statistics per group (one hash aggregate)."""
    n_tok = token_count(F.col(text_col)).cast("long")
    return (
        df.select(*group_cols, n_tok.alias("__n"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            # 4-decimal truncation, not round(): engine-stable (round
            # tie-breaking on doubles differs across engines; see
            # quality_features.trunc4)
            (F.floor(F.avg("__n") * 10000) / F.lit(10000.0)).alias(
                "avg_tokens"
            ),
            F.max("__n").alias("max_tokens"),
        )
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "fingerprint",
) -> DataFrame:
    """Canonical md5 fingerprint of the normalized text (exact dedup key)."""
    return df.withColumn(out_col, text_fingerprint(F.col(text_col)))


#: boilerplate markers common in crawled web text — the C4/RefinedWeb
#: cleaning heuristics drop or downweight documents dominated by these
_BOILERPLATE_MARKERS = (
    "javascript",
    "cookie",
    "copyright",
    "all rights reserved",
    "terms of use",
    "privacy policy",
)


def web_artifact_features(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Crawl-cleaning signals: URL/email density and boilerplate markers.

    Appends ``n_urls``, ``n_emails``, ``n_boilerplate`` (marker hits,
    case-insensitive), and ``artifact_ratio`` (artifact tokens over
    total tokens, 4-decimal truncated) — the standard C4-style features
    a pipeline thresholds on before training.  Pure ``regexp_count``
    column expressions, so the pass rides the ingest scan at any scale;
    patterns are intentionally simple/portable (full RFC URL parsing
    belongs in a UDF nobody needs for corpus filtering).
    """
    c = F.col(text_col)
    n_urls = F.regexp_count(c, F.lit(r"https?://[^\s]+"))
    n_emails = F.regexp_count(
        c, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    )
    low = F.lower(c)
    n_boiler = sum(
        (F.regexp_count(low, F.lit(m)) for m in _BOILERPLATE_MARKERS),
        F.lit(0),
    )
    n_tok = F.greatest(F.size(tokens(c)), F.lit(1)).cast("double")
    ratio = (n_urls + n_emails).cast("double") / n_tok
    return (
        df.withColumn("n_urls", n_urls.cast("long"))
        .withColumn("n_emails", n_emails.cast("long"))
        .withColumn("n_boilerplate", n_boiler.cast("long"))
        .withColumn(
            "artifact_ratio", F.floor(ratio * 10000) / F.lit(10000.0)
        )
    )


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition signals (Gopher-style repetition
    filters): fraction of duplicate lines and duplicate word-bigrams.

    Machine-generated and boilerplate-heavy pages repeat themselves;
    corpus pipelines drop documents above a duplicate-fraction
    threshold.  Appends ``dup_line_ratio`` and ``dup_bigram_ratio``
    (1 − distinct/total, 4-decimal truncated, 0.0 for empty docs) —
    pure array expressions over one split, no shuffle, no Python.
    """
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines).cast("double")
    dup_lines = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines)).cast("double")) / n_lines,
    ).otherwise(F.lit(0.0))
    toks = tokens(c)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    n_bi = F.size(bigrams).cast("double")
    dup_bi = F.when(
        n_bi > 0,
        (n_bi - F.size(F.array_distinct(bigrams)).cast("double")) / n_bi,
    ).otherwise(F.lit(0.0))
    trunc = lambda col: F.floor(col * 10000) / F.lit(10000.0)  # noqa: E731
    return df.withColumn("dup_line_ratio", trunc(dup_lines)).withColumn(
        "dup_bigram_ratio", trunc(dup_bi)
    )


def redact_artifacts(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str | None = None,
    url_token: str = "<URL>",
    email_token: str = "<EMAIL>",
) -> DataFrame:
    """Replace URLs and email addresses with placeholder tokens.

    The standard pre-training scrub for incidental contact info: same
    simple/portable patterns as :func:`web_artifact_features`, applied
    with ``regexp_replace`` so redaction rides the scan.  ``out_col``
    defaults to replacing ``text_col`` in place.
    """
    target = out_col or text_col
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(c, r"https?://[^\s]+", url_token),
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        email_token,
    )
    return df.withColumn(target, redacted)


#: PII patterns (deliberately simple/portable, like the artifact
#: patterns above): phone = NANP-ish 3-3-4 with optional country code
#: and separators; ipv4 = dotted quad (octet range not enforced — a
#: redactor prefers false positives over leaked addresses); ssn =
#: hyphenated 3-2-4; card CANDIDATES are 13-16 digit runs with
#: optional space/hyphen separators, validated by Luhn before
#: redaction so order numbers and timestamps survive.
PII_PATTERNS = {
    "phone": (
        r"(?<![\d.])(?:\+?\d{1,2}[-. ]?)?"
        r"(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}(?![\d.])"
    ),
    "ipv4": r"(?<![\d.])(?:\d{1,3}\.){3}\d{1,3}(?![\d.])",
    "ssn": r"(?<![\d-])\d{3}-\d{2}-\d{4}(?![\d-])",
    "card": r"(?<![\d-])(?:\d[ -]?){12,15}\d(?![\d-])",
}


def _luhn_valid(cand: Column) -> Column:
    """Luhn checksum over a card CANDIDATE string — pure higher-order
    column expressions (filter/transform/reverse/aggregate), zero
    Python in the row path."""
    digits = F.transform(
        F.filter(F.split(cand, ""), lambda ch: ch.rlike("[0-9]")),
        lambda ch: ch.cast("int"),
    )
    rev = F.reverse(digits)
    doubled = F.transform(
        rev,
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2),
        ).otherwise(d),
    )
    total = F.aggregate(doubled, F.lit(0), lambda acc, d: acc + d)
    n = F.size(digits)
    return (n >= 13) & (n <= 16) & (total % 10 == 0)


def pii_features(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-document PII counts: ``n_phones``, ``n_ipv4``, ``n_ssn``,
    ``n_cards`` (Luhn-valid candidates only), plus the email count the
    artifact pass already measures — the audit signal a curation
    pipeline thresholds or routes on before :func:`redact_pii` scrubs.
    Pure ``regexp_count`` / higher-order expressions; rides the scan.
    """
    c = F.col(text_col)
    cards = F.filter(
        F.regexp_extract_all(c, F.lit(PII_PATTERNS["card"]), 0),
        _luhn_valid,
    )
    return (
        df.withColumn(
            "n_phones",
            F.regexp_count(c, F.lit(PII_PATTERNS["phone"])).cast("long"),
        )
        .withColumn(
            "n_ipv4",
            F.regexp_count(c, F.lit(PII_PATTERNS["ipv4"])).cast("long"),
        )
        .withColumn(
            "n_ssn",
            F.regexp_count(c, F.lit(PII_PATTERNS["ssn"])).cast("long"),
        )
        .withColumn("n_cards", F.size(cards).cast("long"))
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str | None = None,
    phone_token: str = "<PHONE>",
    ip_token: str = "<IP>",
    ssn_token: str = "<SSN>",
    card_token: str = "<CARD>",
) -> DataFrame:
    """Scrub phones / IPv4 / SSNs / Luhn-valid card numbers.

    Completes :func:`redact_artifacts` (URL/email) into the standard
    pre-training PII pass.  Order matters: SSN and phone run before
    ipv4 so a hyphenated SSN is never half-eaten as a dotted quad, and
    card redaction runs FIRST on Luhn-validated candidates only —
    each valid candidate is substituted via an
    ``aggregate(candidates, text, regexp_replace)`` fold, so a
    16-digit order id that fails the checksum survives verbatim.  The
    per-candidate pattern re-applies the card pattern's own
    ``(?<![\\d-])…(?![\\d-])`` context guards, so a candidate's digit
    string embedded inside a LONGER digit run elsewhere in the
    document (where it never was a card match) is left intact — a
    plain literal replace would corrupt it (ADVICE r6).  Candidates
    are drawn from ``[0-9 -]`` only, so splicing them into a regex
    needs no metacharacter escaping.  Everything is codegen'd column
    expressions; no UDFs, no shuffle.
    """
    target = out_col or text_col
    c = F.col(text_col)
    valid_cards = F.filter(
        F.regexp_extract_all(c, F.lit(PII_PATTERNS["card"]), 0),
        _luhn_valid,
    )
    carded = F.aggregate(
        valid_cards,
        c,
        lambda acc, cand: F.regexp_replace(
            acc,
            F.concat(
                F.lit(r"(?<![\d-])"), cand, F.lit(r"(?![\d-])")
            ),
            F.lit(card_token),
        ),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                carded, PII_PATTERNS["ssn"], ssn_token
            ),
            PII_PATTERNS["phone"],
            phone_token,
        ),
        PII_PATTERNS["ipv4"],
        ip_token,
    )
    return df.withColumn(target, redacted)


#: documented Gopher/C4-flavored default thresholds for keep_document
QUALITY_FILTER_DEFAULTS = {
    "min_tokens": 8,
    "max_tokens": 100_000,
    "min_alpha_ratio": 0.5,
    "min_mean_tok_len": 2.0,
    "max_mean_tok_len": 12.0,
    "max_dup_line_ratio": 0.3,
    "max_dup_bigram_ratio": 0.5,
    "max_artifact_ratio": 0.5,
}


def keep_document(
    df: DataFrame,
    text_col: str = "text",
    *,
    thresholds: dict | None = None,
    out_col: str = "keep",
) -> DataFrame:
    """Compose the cleaning signals into one keep/drop decision.

    Appends every underlying feature column plus a boolean ``keep``
    (Gopher/C4-flavored thresholds, overridable per key via
    ``thresholds``).  One projection over the scan — the features share
    subexpressions and nothing shuffles, so the full corpus filter is
    a map-only pass at any scale.
    """
    t = dict(QUALITY_FILTER_DEFAULTS)
    t.update(thresholds or {})
    unknown = set(t) - set(QUALITY_FILTER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown threshold keys: {sorted(unknown)}")
    out = quality_features(df, text_col)
    out = repetition_features(out, text_col)
    out = web_artifact_features(out, text_col)
    keep = (
        (F.col("n_tokens") >= t["min_tokens"])
        & (F.col("n_tokens") <= t["max_tokens"])
        & (F.col("alpha_ratio") >= t["min_alpha_ratio"])
        & (F.col("mean_tok_len") >= t["min_mean_tok_len"])
        & (F.col("mean_tok_len") <= t["max_mean_tok_len"])
        & (F.col("dup_line_ratio") <= t["max_dup_line_ratio"])
        & (F.col("dup_bigram_ratio") <= t["max_dup_bigram_ratio"])
        & (F.col("artifact_ratio") <= t["max_artifact_ratio"])
    )
    return out.withColumn(out_col, keep)


def line_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 1,
    sep: str = "\n",
    min_line_chars: int = 1,
    out_col: str = "clean_text",
    join_sep: str | None = None,
    broadcast_frequent: bool | None = None,
) -> DataFrame:
    """Corpus-level line deduplication (CCNet/RefinedWeb-style
    boilerplate removal): drop every line that occurs in more than
    ``max_doc_freq`` DISTINCT documents — navigation chrome, cookie
    banners, license footers — and re-assemble each document from its
    surviving lines in original order.

    Complements :func:`repetition_features` (within-document signals):
    this is the ACROSS-document pass a crawl-cleaning pipeline runs
    before near-dup detection, so shared boilerplate stops gluing
    unrelated pages into one MinHash cluster.

    Output: ``(id_col, out_col, n_lines, n_removed)`` — one row per
    input document (documents whose every line is boilerplate come
    back with an empty ``out_col``).

    Scale shape: lines shuffle once as ``(xxhash64(line), id)`` longs
    to count distinct documents per line (map-side combinable) — the
    document TEXT never crosses a KEYED exchange.  (The one exception:
    when the input scan has fewer splits than the cluster, a single
    round-robin ``spread()`` pass widens it first — a no-op on wide
    production inputs.)  The rebuild gathers each
    affected document's OWN frequent-hash set (longs only) and joins
    it back onto the corpus so line removal is a row-local array
    ``filter`` over the document's own line array; no exchange ever
    carries more than longs plus — at worst — ONE pass of the line
    arrays keyed by the document's own id.

    ``broadcast_frequent`` selects how that rebuild join executes:

    * ``None`` (default, self-selecting) — no join-strategy hint;
      AQE measures the per-doc-set side at RUNTIME and broadcasts it
      when it fits ``spark.sql.autoBroadcastJoinThreshold``, else
      falls back to a shuffled join.  On a crawl corpus, boilerplate
      incidence is near-universal, so the affected-document set is
      O(corpus docs) — a forced broadcast there blows the driver at
      scale, which is exactly why the decision is left to the
      measured size rather than a compile-time flag.
    * ``True`` — force the broadcast hint (text-shuffle-free rebuild;
      only long exchanges).  Opt in when the affected-doc set is
      known small (low-incidence boilerplate, e.g. license footers).
    * ``False`` — legacy explode/``collect_list`` path: marks lines
      with a broadcast semi-join and re-assembles per document,
      shuffling the exploded text once grouped by its own id.

    Trimmed lines shorter than
    ``min_line_chars`` are kept verbatim (never counted, never
    removed) — blank separators are not evidence of boilerplate.
    """
    if max_doc_freq < 1:
        raise ValueError("max_doc_freq must be >= 1")
    # split/explode + the row-local rebuild are CPU-bound per-row work;
    # widen a narrow scan before it (no-op when input splits already
    # cover the cluster).  Results are partitioning-independent: the
    # count aggregate is commutative and the rebuild is row-local.
    df = spread(df)
    # ``sep`` splits as a Java REGEX but survivors re-join with a
    # LITERAL string.  For a literal sep (the "\n" default) the same
    # string serves both roles; a regex sep (e.g. r"\r?\n") would
    # inject its metacharacters verbatim into every document, so it
    # demands an explicit ``join_sep``.
    import re as _re

    if join_sep is None:
        if _re.escape(sep) != sep and sep not in ("\n", "\t", " "):
            raise ValueError(
                f"line_dedup: sep {sep!r} contains regex "
                "metacharacters; pass join_sep with the literal "
                "separator to re-assemble documents with"
            )
        join_sep = sep
    # sep is a Java regex (Spark split semantics); NULL text behaves as
    # empty so a document never silently vanishes from the output.
    # The line array is staged as its own projection so size() above
    # the Generate reads the materialized array instead of re-splitting
    # the text per exploded line (the O(lines²)-per-doc re-derivation
    # cliff — see decontamination._word_grams).
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), sep, -1)
    exploded = (
        df.select(F.col(id_col), lines.alias("__lines"))
        .select(
            F.col(id_col),
            F.size("__lines").alias("__n_lines"),
            F.posexplode("__lines").alias("__pos", "__line"),
        )
        .withColumn("__trim", F.trim(F.col("__line")))
    )
    countable = F.length(F.col("__trim")) >= min_line_chars
    # pass 1: lines over the document-frequency cap (longs only)
    frequent = (
        exploded.filter(countable)
        .groupBy(F.xxhash64("__trim").alias("__lh"))
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("__lh")
    )

    if broadcast_frequent is not False:
        # array rebuild: gather each affected document's OWN
        # frequent-hash set (longs only — hashes of frequent lines
        # join against the exploded hashes, then one (id, hash)
        # shuffle), join those per-doc sets back onto the corpus, and
        # drop lines row-locally with an array filter.  Membership
        # tests run against the doc's own few hashes, not the global
        # set.  broadcast_frequent=True pins both joins broadcast
        # (text-shuffle-free); the None default leaves them unhinted
        # so AQE picks broadcast vs shuffle from the MEASURED sizes —
        # the affected-doc set is O(corpus) on high-incidence crawls
        # and must not be force-broadcast there.
        hint = F.broadcast if broadcast_frequent else (lambda d: d)
        flagged = (
            exploded.filter(countable)
            .select(F.col(id_col), F.xxhash64("__trim").alias("__lh"))
            .join(hint(frequent), on="__lh")
            .groupBy(id_col)
            .agg(F.collect_set("__lh").alias("__fh"))
        )
        is_dup = lambda l: (  # noqa: E731
            F.length(F.trim(l)) >= min_line_chars
        ) & F.array_contains(F.col("__fh"), F.xxhash64(F.trim(l)))
        staged = (
            df.select(F.col(id_col), lines.alias("__lines"))
            .join(hint(flagged), on=id_col, how="left")
            .withColumn(
                "__kept",
                F.when(
                    F.col("__fh").isNull(), F.col("__lines")
                ).otherwise(F.filter("__lines", lambda l: ~is_dup(l))),
            )
        )
        return staged.select(
            id_col,
            F.array_join("__kept", join_sep).alias(out_col),
            F.size("__lines").cast("long").alias("n_lines"),
            (F.size("__lines") - F.size("__kept"))
            .cast("long")
            .alias("n_removed"),
        )

    # pass 2 (join path): mark, then re-assemble in position order
    marked = exploded.join(
        F.broadcast(frequent),
        on=(F.xxhash64("__trim") == F.col("__lh")) & countable,
        how="left",
    ).select(
        id_col,
        "__n_lines",
        "__pos",
        "__line",
        F.col("__lh").isNotNull().alias("__drop"),
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("__drop"),
                F.struct(F.col("__pos"), F.col("__line")),
            )
        )
    )
    return (
        marked.groupBy(id_col, "__n_lines")
        .agg(
            F.array_join(
                F.transform(kept, lambda s: s["__line"]), join_sep
            ).alias(out_col),
            F.sum(F.col("__drop").cast("int")).alias("__removed"),
        )
        .select(
            id_col,
            out_col,
            F.col("__n_lines").cast("long").alias("n_lines"),
            F.col("__removed").cast("long").alias("n_removed"),
        )
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_words: int = 512,
    overlap: int = 64,
    out_col: str = "chunk_text",
) -> DataFrame:
    """Split long documents into overlapping context-window chunks.

    The training-shard preprocessor: one output row per chunk —
    ``(id_col, chunk_index, out_col, n_words)`` — where chunk ``i``
    covers words ``[i·stride, i·stride + max_words)`` with
    ``stride = max_words - overlap``.  Whitespace-token granularity;
    chunk text is the words re-joined with single spaces (original
    inter-word whitespace is not preserved — the standard trade for
    token-aligned chunking).  Documents with no words yield no rows.

    Pure column expressions: the word array and the chunk array are
    each staged as their own projection (computed once per row, not
    re-derived per exploded chunk — see
    ``decontamination._word_grams``), then ``posexplode`` fans out.
    No shuffle, no Python — the full corpus chunks in one codegen'd
    scan at any scale, and composes with :func:`pack_greedy
    <data_toolz_spark.operators.sampling.pack_greedy>` for shard
    assembly.
    """
    if max_words <= 0:
        raise ValueError("max_words must be positive")
    if not 0 <= overlap < max_words:
        raise ValueError("overlap must satisfy 0 <= overlap < max_words")
    stride = max_words - overlap
    raw = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", -1)
    words = F.filter(raw, lambda w: w != F.lit(""))
    staged = df.select(F.col(id_col), words.alias("__words"))
    n = F.size(F.col("__words"))
    # chunks = ceil((n - overlap) / stride), min 1 for any non-empty doc
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(F.col("__words"), i * stride + 1, max_words), " "
            ).alias("txt"),
            F.least(n - i * F.lit(stride), F.lit(max_words)).alias("wc"),
        ),
    )
    chunked = staged.filter(n > 0).select(
        F.col(id_col), chunks.alias("__chunks")
    )
    # posexplode_OUTER: the inferred ``size(__chunks) > 0`` guard a
    # plain posexplode gets would push below this projection and
    # re-inline the whole chunk-building transform into a Filter
    # (see remove_duplicate_spans / ngram_decontaminate); n > 0 above
    # already guarantees non-empty, so no null rows exist to drop
    return chunked.select(
        F.col(id_col),
        F.posexplode_outer("__chunks").alias("chunk_index", "__c"),
    ).filter(F.col("chunk_index").isNotNull()).select(
        id_col,
        "chunk_index",
        F.col("__c.txt").alias(out_col),
        F.col("__c.wc").cast("long").alias("n_words"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    *,
    doc_id_col: str | None = None,
    top_v: int | None = None,
    min_count: int = 1,
    lowercase: bool = True,
    rank_col: str | None = "rank",
    group_col: str | None = None,
) -> DataFrame:
    """Corpus vocabulary: token frequency table, optionally truncated
    to a deterministic top-V — the input a tokenizer/vocab trainer
    needs from a 100 TB corpus.

    ``group_col`` (r11): per-group vocabularies in ONE aggregate —
    the key becomes (group, token), so a per-language LM (CCNet,
    Wenzek et al. 2020 §4.3) costs the same single shuffle as the
    global one instead of a driver loop over languages.  Incompatible
    with ``top_v`` (a per-group top-V needs a per-group window — cut
    downstream if needed).

    Scale shape: one ``explode`` → one hash aggregate with map-side
    partial combine (only (token, partial count) pairs cross the
    shuffle — bounded by DISTINCT vocabulary per task, not corpus
    tokens).  ``doc_id_col`` adds document frequency via Spark's
    two-phase distinct-aggregate rewrite; omit it to skip that second
    shuffle when only term frequency matters.  ``top_v`` plans as
    ``TakeOrderedAndProject`` (per-partition top-V + one small merge,
    never a global sort); ties at the cut break deterministically by
    (tf DESC, token ASC), so the selected set is reproducible.
    ``rank_col`` (top-V only) numbers the ≤ V survivors with a window
    over the already-limited frame — single-partition by construction,
    but over at most ``top_v`` rows, never the corpus.

    Output: ``token, tf[, doc_freq][, rank]``.
    """
    if top_v is not None and top_v <= 0:
        raise ValueError("build_vocab: top_v must be positive")
    if group_col is not None and top_v is not None:
        raise ValueError(
            "build_vocab: group_col is incompatible with top_v"
        )
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    gcols = [group_col] if group_col is not None else []
    sel = [*gcols, F.explode(tokens(txt)).alias("token")]
    if doc_id_col:
        sel.append(F.col(doc_id_col).alias("__doc"))
    base = df.select(*sel)
    aggs = [F.count(F.lit(1)).alias("tf")]
    if doc_id_col:
        aggs.append(F.count_distinct(F.col("__doc")).alias("doc_freq"))
    vocab = base.groupBy(*gcols, "token").agg(*aggs)
    if min_count > 1:
        vocab = vocab.filter(F.col("tf") >= F.lit(min_count))
    if top_v is not None:
        vocab = truncate_vocab(vocab, top_v, rank_col=rank_col)
    return vocab


def truncate_vocab(
    vocab: DataFrame,
    top_v: int,
    *,
    rank_col: str | None = "rank",
) -> DataFrame:
    """Deterministic top-V cut of an already-built vocabulary frame
    (``token, tf, …``) — the truncation half of :func:`build_vocab`,
    exposed so a caller that feeds SEVERAL consumers from one persisted
    full-vocab aggregation (e.g. the top-V cut *and* a frequency
    sketch) pays the token-stream explode exactly once.

    Same contract as ``build_vocab(top_v=…)``: ties at the cut break by
    (tf DESC, token ASC), plans as ``TakeOrderedAndProject`` (never a
    global sort), and ``rank_col`` numbers the ≤ V survivors with a
    window over the already-limited frame.
    """
    if top_v <= 0:
        raise ValueError("truncate_vocab: top_v must be positive")
    vocab = vocab.orderBy(
        F.col("tf").desc(), F.col("token").asc()
    ).limit(top_v)
    if rank_col:
        from pyspark.sql.window import Window

        w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
        vocab = vocab.withColumn(rank_col, F.row_number().over(w))
    return vocab


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    *,
    group_cols: tuple[str, ...] = (),
    lowercase: bool = True,
) -> DataFrame:
    """Token coverage of a vocabulary over a corpus: the fraction of
    corpus token OCCURRENCES found in ``vocab`` (the standard
    tokenizer-eval metric; 1 − coverage = OOV rate).

    The vocab side (≤ a few hundred thousand rows) broadcasts; the
    corpus side is one explode + map-side hash join + one aggregate —
    the corpus never shuffles.  Optional ``group_cols`` (e.g. lang)
    report coverage per group in the same single pass.

    Output: ``group_cols + [total_tokens, covered_tokens, coverage]``
    (coverage truncated to 4 decimals for cross-engine comparability).
    """
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    base = df.select(
        *[F.col(c) for c in group_cols],
        F.explode(tokens(txt)).alias("token"),
    )
    marked = base.join(
        F.broadcast(vocab.select("token").distinct().withColumn(
            "__in", F.lit(1)
        )),
        on="token",
        how="left",
    )
    total = F.count(F.lit(1))
    covered = F.sum(F.coalesce(F.col("__in"), F.lit(0)))
    grouped = marked.groupBy(*group_cols) if group_cols else marked.groupBy()
    return grouped.agg(
        total.alias("total_tokens"),
        covered.cast("long").alias("covered_tokens"),
        (
            F.floor(
                covered.cast("double")
                / F.greatest(total, F.lit(1)).cast("double")
                * 10000
            )
            / 10000
        ).alias("coverage"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 50,
    min_docs: int = 2,
    out_col: str = "text",
    count_col: str = "n_dropped_words",
) -> DataFrame:
    """ExactSubstr-style duplicate-span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    ``n``-word span occurring in ≥ ``min_docs`` distinct documents is
    cut from every document EXCEPT the lowest-id one holding it, so
    exactly one canonical copy of each long repeated passage survives
    the corpus.

    The published implementation builds a suffix array over the whole
    corpus; the distributed shape here is the hashed-gram inverted
    index (the same candidate structure the decontamination and
    line-dedup passes use):

    1. each doc emits its word ``n``-grams WITH positions — grams leave
       the row as ``xxhash64`` longs, so the shuffle payload is
       (id, pos, hash), never text;
    2. one aggregate per gram hash finds cross-doc spans
       (``n_docs >= min_docs``) and their keeper (``min(id)``);
    3. flagged positions ship back to their docs (payload-free join on
       the hash), and the rebuild is ROW-LOCAL: a word survives unless
       some flagged span ``[p, p+n)`` covers its index — one
       codegen'd ``filter``/``exists`` over the token array.

    Total cost: one gram shuffle bounded by corpus token count, one
    aggregate bounded by DISTINCT gram content, one join back.  No
    suffix array, no global sort.  The trade vs the paper: only spans
    aligned on word boundaries and exactly ``n`` words long seed the
    match (a shared passage of length L ≥ n is covered by its L-n+1
    overlapping grams, so whole passages are still cut).

    Docs that lose a span are re-joined with single spaces (original
    inter-word whitespace is not reconstructed); untouched docs keep
    their text byte-identical.  Spans repeated only WITHIN one doc are
    kept (cross-doc boilerplate is the target; use
    ``repetition_features`` to gate within-doc repeats).
    """
    if n < 2:
        raise ValueError("remove_duplicate_spans: n must be >= 2")
    if min_docs < 2:
        raise ValueError(
            "remove_duplicate_spans: min_docs must be >= 2 (a span "
            "must repeat across documents to be a duplicate)"
        )
    # gram hashing and the span-cut rebuild are heavy row-local passes
    # over the token array; widen a narrow input first (no-op when the
    # scan already has >= defaultParallelism splits).  Both consumers
    # (gram index + rebuild) read the same spread subtree.
    df = spread(df)
    pos_grams = positioned_gram_hashes(
        df, n=n, id_col=id_col, text_col=text_col
    )

    spans = pos_grams.groupBy("__k").agg(
        F.count_distinct("__id").alias("__nd"),
        F.min("__id").alias("__keeper"),
    ).filter(F.col("__nd") >= F.lit(min_docs))

    flagged = (
        pos_grams.join(spans, on="__k")
        .filter(F.col("__id") != F.col("__keeper"))
        .groupBy("__id")
        .agg(F.collect_set("__pos").alias("__cuts"))
    )
    return cut_flagged_spans(
        df,
        flagged,
        n=n,
        id_col=id_col,
        text_col=text_col,
        out_col=out_col,
        count_col=count_col,
    )


def positioned_gram_hashes(
    df: DataFrame,
    *,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(__id, __pos, __k)`` — every word-``n``-gram of every doc as
    an ``xxhash64`` long with its word position: the shared candidate
    structure of :func:`remove_duplicate_spans` and the incremental
    gram index (``operators.incremental``).  Grams leave the row as
    longs, so nothing text-sized ever shuffles."""
    from data_toolz_spark.operators.decontamination import (
        _grams_of_words_ordered,
    )

    toks = tokens(F.col(text_col))
    # Stage the word array BEFORE building grams: the zip_with chain
    # references its input ~2n times, and substituting the
    # split+filter+lower expression at every site re-tokenizes the
    # text ~2n times per row (lambda-bearing expressions defeat
    # codegen's subexpression elimination — measured 2.6x on this
    # operator).  A multiply-referenced non-cheap alias survives
    # CollapseProject, so the tokenization runs once.  Same reasoning
    # as decontamination.eval_gram_set's ``__w`` staging.
    worded = df.select(
        F.col(id_col).alias("__id"),
        F.transform(toks, F.lower).alias("__w"),
    )
    staged = worded.select(
        "__id", _grams_of_words_ordered(F.col("__w"), n).alias("__grams")
    )
    # posexplode_OUTER, then drop the null rows ourselves:
    # InferFiltersFromGenerate gives plain posexplode a
    # ``size(__grams) > 0`` guard that pushes below the projections
    # and re-inlines the whole gram+tokenize chain into a Filter —
    # measured 4x this operator's scan stage.  The outer variant gets
    # no inferred filter; empty-gram docs surface as one null row and
    # die in the cheap post-explode filter instead.
    return (
        staged.select(
            "__id",
            F.posexplode_outer("__grams").alias("__pos", "__g"),
        )
        .filter(F.col("__pos").isNotNull())
        .select("__id", "__pos", F.xxhash64("__g").alias("__k"))
    )


def cut_flagged_spans(
    df: DataFrame,
    flagged: DataFrame,
    *,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text",
    count_col: str = "n_dropped_words",
) -> DataFrame:
    """Row-local rebuild shared by :func:`remove_duplicate_spans` and
    the incremental span dedup: ``flagged`` is ``(__id, __cuts)`` with
    the word positions whose length-``n`` spans must go; a word
    survives unless a flagged span covers its index.  Docs absent
    from ``flagged`` keep their text byte-identical; cut docs re-join
    on single spaces (the :func:`remove_duplicate_spans` contract).
    """
    toks = tokens(F.col(text_col))
    # Merge the flagged cut positions into DISJOINT intervals before
    # the coverage test (VERDICT r6 item 7): a heavily-duplicated doc
    # has cuts ≈ tokens, so testing every token against every cut is
    # O(L²) row-locally.  Cuts are sorted; because every span is
    # exactly ``n`` long, a cut opens a NEW merged interval iff it
    # starts beyond the previous cut's span end, and closes one iff
    # the next cut starts beyond its own end — two linear filters +
    # one zip, no quadratic accumulator.  The fully-duplicated doc
    # collapses to ONE interval and coverage becomes O(L).
    # ``F.get`` (0-based) returns NULL out of range even under ANSI,
    # and `true OR null = true` keeps the boundary lambdas total.
    # EVERY intermediate array is staged as its own projection: the
    # boundary lambdas reference the sorted array per ELEMENT, so an
    # inlined array_sort would re-sort the cuts once per cut —
    # re-introducing the O(L²) (with a log) this merge removes.
    cs = F.col("__cs")
    starts = F.filter(
        cs, lambda p, i: (i == F.lit(0)) | (p > F.get(cs, i - 1) + F.lit(n))
    )
    ends = F.transform(
        F.filter(
            cs,
            lambda p, i: (i == F.size(cs) - 1)
            | (F.get(cs, i + 1) > p + F.lit(n)),
        ),
        lambda p: p + F.lit(n),
    )
    intervals = F.zip_with(
        F.col("__ivs"),
        F.col("__ive"),
        lambda s, e: F.struct(s.alias("s"), e.alias("e")),
    )
    # rebuild staging mirrors the gram side: tokens once, the sorted
    # cuts once, the interval bounds once, the filtered survivor array
    # once, THEN the two consumers (text join, drop count) read the
    # staged columns
    out = (
        df.join(flagged, on=F.col(id_col) == F.col("__id"), how="left")
        .drop("__id")
        .withColumn("__t", toks)
        .withColumn("__cs", F.array_sort(F.col("__cuts")))
        .withColumn("__ivs", starts)
        .withColumn("__ive", ends)
        .withColumn(
            "__iv",
            F.when(F.col("__cuts").isNotNull(), intervals),
        )
        .withColumn(
            "__r",
            F.when(F.col("__iv").isNull(), F.col("__t")).otherwise(
                F.filter(
                    F.col("__t"),
                    lambda t, i: ~F.exists(
                        F.col("__iv"),
                        lambda iv: (iv["s"] <= i) & (i < iv["e"]),
                    ),
                )
            ),
        )
    )
    kept = F.when(
        F.col("__cuts").isNull(), F.col(text_col)
    ).otherwise(F.array_join(F.col("__r"), " "))
    dropped = F.size(F.col("__t")) - F.size(F.col("__r"))
    return (
        out.withColumn(count_col, dropped.cast("long"))
        .withColumn(out_col, kept)
        .drop("__cuts", "__cs", "__ivs", "__ive", "__iv", "__t", "__r")
    )


def tfidf_terms(
    df: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    lowercase: bool = True,
    n_docs: int | None = None,
) -> DataFrame:
    """Per-document top-``top_k`` terms by TF-IDF — keyword extraction
    against a corpus model, the labeling/routing signal curation
    pipelines attach before sharding.

    ``vocab`` is a :func:`build_vocab` output WITH ``doc_freq`` (pass
    ``doc_id_col`` when building).  Scoring uses the smooth idf
    ``ln((N+1)/(df+1)) + 1`` (sklearn's formulation), tf is the raw
    in-document count, and scores truncate to 4 decimals so results
    are engine-comparable.  Ties at the cut break deterministically by
    (score DESC, token ASC).

    Scale shape: the model broadcasts; the corpus side is one explode
    → map-side join → one (doc, token) aggregate → per-doc window
    top-k (partitioned by doc — no global sort).  Output:
    ``id_col, token, tf, score, rank``.
    """
    if top_k <= 0:
        raise ValueError("tfidf_terms: top_k must be positive")
    if "doc_freq" not in vocab.columns:
        raise ValueError(
            "tfidf_terms: vocab lacks doc_freq — call build_vocab with "
            "doc_id_col so document frequency is computed"
        )
    import math

    from pyspark.sql.window import Window

    if n_docs is None:
        n_docs = df.count()
    model = F.broadcast(
        vocab.select(
            "token",
            (
                F.log(
                    (F.lit(float(n_docs) + 1.0))
                    / (F.col("doc_freq").cast("double") + 1.0)
                )
                + 1.0
            ).alias("__idf"),
        )
    )
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    counts = (
        df.select(F.col(id_col), F.explode(tokens(txt)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = counts.join(model, on="token").withColumn(
        "score",
        F.floor(F.col("tf") * F.col("__idf") * 10000) / 10000,
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "token", "tf", "score", "rank")
    )


def unigram_logprob(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    lowercase: bool = True,
    alpha: float = 1.0,
    out_col: str = "nll",
) -> DataFrame:
    """Per-document mean negative log-probability under a unigram LM —
    the CCNet-style fluency signal, with the corpus's own
    :func:`build_vocab` output standing in for the KenLM model.

    CCNet buckets a crawl into head/middle/tail by LM perplexity; the
    unigram version keeps the same pipeline shape (score every doc
    against a broadcast model, bucket on the score) while the "model"
    is just ``(token, tf)`` rows.  Smoothing is add-``alpha``: an OOV
    token costs ``-log(alpha / (N + alpha·(V+1)))`` — the most
    expensive token in the model, so OOV-dense docs rank as tail.

    Scale shape: the model broadcasts (it is a vocab, not a corpus),
    the corpus side is one explode → map-side hash join → one
    re-aggregation keyed by ``id_col`` — one shuffle of (id, partial
    sums), never of text.  Docs with zero tokens get NULL.

    Output: the (id, ``out_col``) score frame, ready for
    ``win_ntile``-style bucketing or a threshold filter.
    """
    if alpha <= 0:
        raise ValueError("unigram_logprob: alpha must be positive")
    import math

    stats = vocab.agg(
        F.sum("tf").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    if stats["n"] is None or stats["v"] == 0:
        raise ValueError(
            "unigram_logprob: empty vocabulary model — build_vocab "
            "returned no rows (over-aggressive min_count, or an empty "
            "training corpus)"
        )
    n_tokens, v_size = int(stats["n"]), int(stats["v"])
    denom = float(n_tokens) + alpha * (v_size + 1)
    oov_nll = -math.log(alpha / denom)

    model = F.broadcast(
        vocab.select(
            "token",
            (-F.log((F.col("tf") + F.lit(alpha)) / F.lit(denom))).alias(
                "__nll"
            ),
        )
    )
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    exploded = df.select(
        F.col(id_col), F.explode(tokens(txt)).alias("token")
    )
    scored = exploded.join(model, on="token", how="left").select(
        id_col,
        F.coalesce(F.col("__nll"), F.lit(oov_nll)).alias("__nll"),
    )
    return scored.groupBy(id_col).agg(
        (F.floor(F.avg("__nll") * 10000) / 10000).alias(out_col)
    )


#: Core named/numeric entities a crawl-cleaning pass must decode —
#: ``&amp;`` is deliberately LAST so already-decoded payloads are not
#: double-decoded (the standard ordering).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: Block-level closers (plus <br>) that become newlines when
#: ``block_newlines=True`` — keeps line identity for the line-level
#: operators downstream (line_dedup, boilerplate line filters).
_HTML_BLOCK_RE = (
    r"(?is)</(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote)>|<br\s*/?>"
)


def strip_html(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "clean_text",
    block_newlines: bool = True,
) -> DataFrame:
    """Crawl front-door HTML-to-text: drop script/style/comment blocks,
    turn block-level tag closers into newlines, strip remaining tags,
    decode the core entities, normalize whitespace.

    The whole pass is a chain of ``regexp_replace`` / literal
    ``replace`` column expressions — pure codegen riding the ingest
    scan (zero UDFs, zero shuffles), and every pattern is RE2-safe (no
    backreferences, no lookarounds), so the identical chain replays in
    any SQL engine — the same portability contract as ``redact_pii``.
    This is a cleaning heuristic, not an HTML5 parser: unterminated
    ``<script`` swallows to the next ``</script>`` or survives as
    text, exotic entities pass through verbatim — the right trade for
    boilerplate removal at crawl scale (a DOM parser belongs in a UDF
    nobody needs for corpus filtering).

    ``block_newlines=True`` preserves line structure (one line per
    block element) so line-level operators compose downstream; False
    flattens to single-space text.
    """
    c = F.col(text_col)
    # containers whose PAYLOAD must vanish, then comments
    c = F.regexp_replace(c, r"(?is)<script\b.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    if block_newlines:
        c = F.regexp_replace(c, _HTML_BLOCK_RE, "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # horizontal runs → one space; newline runs (w/ flanking space) →
    # one newline; strip the ends
    c = F.regexp_replace(c, r"[^\S\n]+", " ")
    c = F.regexp_replace(c, r"\s*\n\s*", "\n")
    c = F.regexp_replace(c, r"^\s+|\s+$", "")
    return df.withColumn(out_col, c)


def build_bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    min_count: int = 1,
    group_col: str | None = None,
) -> DataFrame:
    """Corpus bigram frequency table ``(w1, w2, bg_count)`` — the
    model half of :func:`bigram_logprob`.

    Scale shape mirrors :func:`build_vocab`: one in-row adjacent-pair
    transform (no self-join — the pairs are built from the token array
    before the explode) → one hash aggregate with map-side partial
    combine, so only (pair, partial count) rows cross the shuffle —
    bounded by the DISTINCT bigram vocabulary per task.  Counts are
    DOUBLE (they only ever enter ratios).  ``group_col`` (r11) keys
    the table by (group, w1, w2) — the per-language-LM arm, same
    single shuffle.
    """
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    gcols = [group_col] if group_col is not None else []
    pairs = (
        df.select(*gcols, tokens(txt).alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            *gcols,
            F.explode(
                F.expr(
                    "transform(slice(__t, 1, size(__t) - 1), (x, i) -> "
                    "named_struct('w1', x, 'w2', element_at(__t, i + 2)))"
                )
            ).alias("p"),
        )
    )
    out = (
        pairs.select(*gcols, "p.w1", "p.w2")
        .groupBy(*gcols, "w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("bg_count"))
    )
    if min_count > 1:
        out = out.filter(F.col("bg_count") >= F.lit(float(min_count)))
    return out


def bigram_logprob(
    df: DataFrame,
    bigram: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    lowercase: bool = True,
    alpha: float = 1.0,
    backoff: float = 0.4,
    out_col: str = "bg_nll",
    group_col: str | None = None,
) -> DataFrame:
    """Per-document mean negative log-score under a bigram LM with
    STUPID BACKOFF (Brants et al. 2007 §4) — the fluency signal one
    order up from :func:`unigram_logprob`, with the backoff scheme
    that paper designed precisely for distributed, count-table LMs
    (no discounting state to normalize across shards):

    ``S(w2|w1) = count(w1 w2) / count(w1)`` when the bigram was seen,
    else ``backoff · (tf(w2) + alpha) / (N + alpha·(V+1))`` — the
    add-alpha unigram score, OOV hitting the +alpha floor.  Scores,
    not probabilities (stupid backoff does not normalize) — which is
    exactly why every quantity here is a ratio of counts and the
    whole model stays SQL-replayable.

    ``bigram`` is :func:`build_bigram_counts` output, ``vocab`` is
    :func:`build_vocab` output from the SAME training corpus (its tf
    doubles as the context count — every seen bigram's c(w1 w2) ≤
    tf(w1), so seen-branch scores stay ≤ 1).

    Scale shape: the corpus side explodes to (doc, w1, w2) pairs and
    re-aggregates by doc — one shuffle of (doc, partial sums).  The
    bigram table joins as a plain equi-join (broadcast when small; at
    corpus-derived sizes AQE picks the shuffle join — the model is
    data, not driver state).  The vocab joins twice (context count +
    backoff numerator), both broadcast-sized.  Docs with < 2 tokens
    get NULL.

    ``group_col`` (r11, the CCNet per-language arm): ``bigram`` and
    ``vocab`` must be the grouped tables (``group_col=`` on their
    builders) and ``df`` must carry the column; every join keys on
    (group, words) and the backoff denominator becomes a per-group
    broadcast join instead of a driver scalar — one model pass scores
    all languages, each against its own LM.  NULL is a REAL group
    (unresolved LID is common in crawl data): the group key joins
    null-safe (struct-wrapped, so NULL-group docs match the NULL-group
    model the builders aggregate — still plain hash joins).  A doc
    whose group has no vocabulary rows at all scores NULL (there is
    no model for it) instead of raising.
    """
    if alpha <= 0:
        raise ValueError("bigram_logprob: alpha must be positive")
    if not 0 < backoff <= 1:
        raise ValueError("bigram_logprob: backoff must be in (0, 1]")
    gcols = [group_col] if group_col is not None else []
    if group_col is None:
        stats = vocab.agg(
            F.sum("tf").alias("n"), F.count(F.lit(1)).alias("v")
        ).collect()[0]
        if stats["n"] is None or stats["v"] == 0:
            raise ValueError(
                "bigram_logprob: empty vocabulary model — an empty "
                "training corpus cannot score anything"
            )
        denom = F.lit(float(stats["n"]) + alpha * (int(stats["v"]) + 1))
    else:
        denom = F.col("__denom")

    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)

    def with_gkey(frame: DataFrame) -> DataFrame:
        # struct-wrap the group key: struct equality treats NULL
        # fields as equal, so NULL-group rows join their NULL-group
        # model while the join stays a hash equi-join
        if group_col is None:
            return frame
        return frame.withColumn(
            "__g", F.struct(F.col(group_col).alias("g"))
        ).drop(group_col)

    jcols = ["__g"] if group_col is not None else []
    pairs = with_gkey(
        df.select(F.col(id_col), *gcols, tokens(txt).alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            id_col,
            *gcols,
            F.explode(
                F.expr(
                    "transform(slice(__t, 1, size(__t) - 1), (x, i) -> "
                    "named_struct('w1', x, 'w2', element_at(__t, i + 2)))"
                )
            ).alias("p"),
        )
        .select(id_col, *gcols, "p.w1", "p.w2")
    )
    v1 = F.broadcast(
        with_gkey(
            vocab.select(
                *gcols,
                F.col("token").alias("w1"),
                F.col("tf").alias("__tf1"),
            )
        )
    )
    v2 = F.broadcast(
        with_gkey(
            vocab.select(
                *gcols,
                F.col("token").alias("w2"),
                F.col("tf").alias("__tf2"),
            )
        )
    )
    joined = (
        pairs.join(with_gkey(bigram), on=jcols + ["w1", "w2"], how="left")
        .join(v1, on=jcols + ["w1"], how="left")
        .join(v2, on=jcols + ["w2"], how="left")
    )
    if group_col is not None:
        gstats = F.broadcast(
            with_gkey(
                vocab.groupBy(group_col).agg(
                    (
                        F.sum("tf").cast("double")
                        + alpha * (F.count(F.lit(1)) + 1)
                    ).alias("__denom")
                )
            )
        )
        joined = joined.join(gstats, on="__g", how="left")
    score = F.when(
        F.col("bg_count").isNotNull() & F.col("__tf1").isNotNull(),
        F.col("bg_count") / F.col("__tf1"),
    ).otherwise(
        F.lit(backoff)
        * (
            (F.coalesce(F.col("__tf2").cast("double"), F.lit(0.0)) + alpha)
            / denom
        )
    )
    return joined.groupBy(id_col).agg(
        (F.floor(F.avg(-F.log(score)) * 10000) / 10000).alias(out_col)
    )


def score_bigram_divergence(
    bigram: DataFrame,
    vocab: DataFrame,
    *,
    alpha: float = 1.0,
    backoff: float = 0.4,
    group_col: str | None = None,
) -> DataFrame:
    """Per-bigram pruning divergence — Stolcke's relative-entropy
    criterion (Stolcke 1998 §2-3) adapted to the stupid-backoff score
    this package's LM actually uses (r12):

    ``divergence(w1, w2) = bg_count · |log S_bigram − log S_backoff|``

    where ``S_bigram = bg_count / tf(w1)`` is the seen-branch score and
    ``S_backoff = backoff · (tf(w2)+alpha) / (N + alpha·(V+1))`` is
    exactly what :func:`bigram_logprob` would fall back to if the row
    were absent — the corpus-weighted log-score shift its removal
    causes.  A bigram the backoff already approximates well (frequent
    w2 after a promiscuous w1) scores near zero and is safe to drop;
    a high-count, high-surprise pair scores large.

    One pass: two broadcast vocab joins + (grouped arm) one broadcast
    totals join — the same join shapes as the scorer.  Rows whose
    context or unigram count is missing from ``vocab`` (mismatched
    tables) get NULL divergence; :func:`prune_bigram_counts` KEEPS
    them (never silently drop what cannot be evaluated).
    ``group_col`` mirrors the builders: per-group totals, NULL-group
    rows joining their NULL-group model via the struct-wrapped key.

    Determinism note: the log is an IEEE double from exact count
    ratios — bit-stable within an engine, but ``ln`` is not correctly
    rounded across engines, so thresholds should not sit on a
    boundary (the twin tests use margin-separated fixtures).
    """
    if alpha <= 0:
        raise ValueError("score_bigram_divergence: alpha must be positive")
    if not 0 < backoff <= 1:
        raise ValueError(
            "score_bigram_divergence: backoff must be in (0, 1]"
        )
    gcols = [group_col] if group_col is not None else []
    if group_col is None:
        stats = vocab.agg(
            F.sum("tf").alias("n"), F.count(F.lit(1)).alias("v")
        ).collect()[0]
        if stats["n"] is None or stats["v"] == 0:
            raise ValueError(
                "score_bigram_divergence: empty vocabulary model"
            )
        denom = F.lit(float(stats["n"]) + alpha * (int(stats["v"]) + 1))
    else:
        denom = F.col("__denom")

    def with_gkey(frame: DataFrame) -> DataFrame:
        if group_col is None:
            return frame
        return frame.withColumn(
            "__g", F.struct(F.col(group_col).alias("g"))
        )

    jcols = ["__g"] if group_col is not None else []
    v1 = F.broadcast(
        with_gkey(
            vocab.select(
                *gcols,
                F.col("token").alias("w1"),
                F.col("tf").alias("__tf1"),
            )
        ).drop(*gcols)
    )
    v2 = F.broadcast(
        with_gkey(
            vocab.select(
                *gcols,
                F.col("token").alias("w2"),
                F.col("tf").alias("__tf2"),
            )
        ).drop(*gcols)
    )
    joined = (
        with_gkey(bigram)
        .join(v1, on=jcols + ["w1"], how="left")
        .join(v2, on=jcols + ["w2"], how="left")
    )
    if group_col is not None:
        gstats = F.broadcast(
            with_gkey(
                vocab.groupBy(group_col).agg(
                    (
                        F.sum("tf").cast("double")
                        + alpha * (F.count(F.lit(1)) + 1)
                    ).alias("__denom")
                )
            ).drop(group_col)
        )
        joined = joined.join(gstats, on="__g", how="left")
    s_bigram = F.col("bg_count").cast("double") / F.col("__tf1")
    s_backoff = (
        F.lit(backoff)
        * (F.col("__tf2").cast("double") + alpha)
        / denom
    )
    div = F.when(
        F.col("__tf1").isNotNull() & F.col("__tf2").isNotNull(),
        F.col("bg_count").cast("double")
        * F.abs(F.log(s_bigram) - F.log(s_backoff)),
    )
    return joined.select(
        *bigram.columns, div.alias("divergence")
    )


def prune_bigram_counts(
    bigram: DataFrame,
    vocab: DataFrame,
    *,
    epsilon: float | None = None,
    top_k: int | None = None,
    alpha: float = 1.0,
    backoff: float = 0.4,
    group_col: str | None = None,
) -> DataFrame:
    """Entropy-prune a bigram table so the LM that ships to every
    executor is bounded — the model-compression step a WEB-SCALE
    stupid-backoff LM needs (r12; CCNet prunes its KenLM models the
    same way, and Stolcke pruning is the standard criterion).

    Because :func:`bigram_logprob` BACKS OFF on any absent bigram,
    pruning is pure row deletion — the scorer is untouched and a doc
    containing only kept bigrams scores IDENTICALLY under the pruned
    and full models (pinned by test).  Keep rules, at least one
    required, both = intersection:

    * ``epsilon`` — keep rows with ``divergence >= epsilon``
      (Stolcke's thresholding);
    * ``top_k`` — keep the k highest-divergence rows, ties broken
      (divergence DESC, w1 ASC, w2 ASC) — deterministic; with
      ``group_col``, k PER GROUP (a small language must not lose its
      whole model to a big one's tail).

    Rows with NULL divergence (not evaluable against ``vocab``) are
    always kept.  Output schema == input schema, so the pruned table
    drops into every existing call site.
    """
    if epsilon is None and top_k is None:
        raise ValueError(
            "prune_bigram_counts: set epsilon and/or top_k"
        )
    if top_k is not None and top_k < 0:
        raise ValueError("prune_bigram_counts: top_k must be >= 0")
    scored = score_bigram_divergence(
        bigram,
        vocab,
        alpha=alpha,
        backoff=backoff,
        group_col=group_col,
    )
    keep = F.col("divergence").isNull()
    if epsilon is not None:
        keep = keep | (F.col("divergence") >= epsilon)
        scored = scored.filter(keep)
    if top_k is not None:
        # null-divergence rows are kept OUTSIDE the k budget (they
        # were never evaluated, they must not crowd out real rows)
        nulls = scored.filter(F.col("divergence").isNull())
        ev = scored.filter(F.col("divergence").isNotNull())
        order = [F.col("divergence").desc(), F.col("w1"), F.col("w2")]
        if group_col is None:
            # distributed TakeOrdered, not a one-task global window
            kept = ev.orderBy(*order).limit(top_k)
        else:
            from pyspark.sql.window import Window

            w = Window.partitionBy(group_col).orderBy(*order)
            kept = (
                ev.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= top_k)
                .drop("__rk")
            )
        scored = kept.unionByName(nulls)
    return scored.select(*bigram.columns)


#: removed outright by :func:`clean_text`: C0 controls except TAB/LF
#: (CR is consumed by the newline rule first), DEL, zero-width
#: joiners/non-joiners/spaces, BOM.  ``\x{…}`` escapes parse
#: identically in Java regex (Spark) and RE2 (DuckDB/ANSI oracles) —
#: the portability contract every regex in this module keeps.
CLEAN_CTRL_RE = (
    r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F"
    r"\x{200B}-\x{200D}\x{FEFF}]"
)

#: unicode horizontal spaces folded to ASCII space: NBSP, OGHAM space,
#: the U+2000 en/em-quad family, NNBSP, MMSP, ideographic space
CLEAN_SPACE_RE = (
    r"[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]"
)

#: CR/CRLF and the unicode line/paragraph separators → LF
CLEAN_NEWLINE_RE = r"\r\n|\r|\x{2028}|\x{2029}"


def _cc(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def nfc_column(text: Column | str) -> Column:
    """Unicode NFC normalization of a string column (combining
    sequences → precomposed forms: ``e`` + U+0301 → ``é``), NULL-safe.

    This is deliberately the ONE Python kernel in the text front door:
    Spark exposes no normalization SQL function (``java.text.
    Normalizer`` exists JVM-side but has no expression), so the
    choices are a per-row JVM UDF (needs compiled code), skipping NFC
    (two byte-different spellings of the same word split every
    downstream vocab/dedup key), or an Arrow-batched pandas UDF —
    pandas ships the normalizer as ``Series.str.normalize``, and the
    column rides the scan as one vectorized batch transfer.  The ANSI
    twin is ``nfc_normalize`` (DuckDB) — differentially pinned.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return _nfc(_cc(text))


def clean_text(
    text: Column | str,
    *,
    nfc: bool = True,
    squeeze_spaces: bool = True,
    max_blank_lines: int | None = 1,
) -> Column:
    """Crawl-text repair — the fix-encoding/strip-junk pass every
    pipeline runs FIRST (the ftfy/CCNet front door), as one column
    expression: NFC (optional, :func:`nfc_column`), newline
    canonicalization (CRLF/CR/U+2028/U+2029 → LF), control and
    zero-width character removal, unicode-space folding, horizontal
    whitespace squeezing, trailing-space-at-EOL strip, blank-line-run
    capping (``max_blank_lines`` kept — paragraph structure survives
    for :func:`line_dedup` and the chunkers), and outer trim.

    Everything except NFC is pure codegen'd ``regexp_replace`` with
    ``\\x{…}`` classes that parse identically under Java regex and
    RE2, so the whole chain is ANSI-SQL-replayable (the oracle runs
    the same replace chain around ``nfc_normalize``).  Idempotent:
    ``clean_text(clean_text(x)) == clean_text(x)`` (pinned) — re-runs
    over partially processed data are no-ops.  NULL → NULL.

    Order matters and is part of the contract: newlines canonicalize
    first (CR is NOT in the control class, so it must resolve before
    anything else sees it), then the control/zero-width strip, THEN
    NFC — a zero-width char between a base letter and its combining
    mark (``e·ZWSP·U+0301``, common in crawled text) blocks
    composition, so the invisibles must be gone before NFC composes
    (NFC itself never produces controls or zero-widths, which is what
    makes the second pass a no-op); space folding before squeezing
    (an NBSP run must collapse like a space run).
    """
    c = _cc(text)
    c = F.regexp_replace(c, CLEAN_NEWLINE_RE, "\n")
    c = F.regexp_replace(c, CLEAN_CTRL_RE, "")
    if nfc:
        c = nfc_column(c)
    c = F.regexp_replace(c, CLEAN_SPACE_RE, " ")
    if squeeze_spaces:
        c = F.regexp_replace(c, r"[ \t]{2,}", " ")
    c = F.regexp_replace(c, r"[ \t]+\n", "\n")
    if max_blank_lines is not None:
        if max_blank_lines < 0:
            raise ValueError(
                "clean_text: max_blank_lines must be >= 0"
            )
        run = max_blank_lines + 2
        c = F.regexp_replace(
            c, r"\n{" + str(run) + r",}", "\n" * (run - 1)
        )
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def rank_thresholds(
    df: DataFrame,
    value_col: str,
    qs: Sequence[tuple[int, int]],
    *,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """EXACT rank quantile thresholds of a numeric column: for each
    fraction ``num/den`` the smallest value ``v`` with
    ``rank(≤ v) ≥ ⌈num·N/den⌉`` — quantiles as pure integer rank
    arithmetic, no interpolation, no approximation, so any SQL engine
    replays the identical cut points (fractions stay integer pairs
    precisely so the target rank is ``(num·N + den − 1) div den``,
    never a float product).

    Scale shape — the reason this is not ``percentile_approx`` or a
    global sort: pass 1 is a value HISTOGRAM (one hash aggregate with
    map-side combine; only (value, partial count) rows shuffle), and
    the ordered cumulative sum runs over the histogram, bounded by the
    column's DISTINCT-value count, not the corpus.  That is the right
    contract for quality scores, which are quantized by construction
    (``bg_nll`` carries 4 decimals; the integer signals are small) —
    for a genuinely unbounded domain use ``dcs_sketch_table`` +
    ``dcs_quantiles`` instead (sketched, mergeable) and accept the
    approximation.  NULL values are excluded (they get no rank and
    :func:`bucket_by_thresholds` gives them a NULL bucket).

    Output: ``group_cols + [q_num, q_den, threshold]``; a group whose
    population is empty emits no rows.
    """
    for num, den in qs:
        if den < 1 or num < 1 or num > den:
            raise ValueError(
                f"rank_thresholds: fraction {num}/{den} must satisfy "
                "0 < num/den <= 1"
            )
    from pyspark.sql.window import Window

    gcols = list(group_cols)
    v = F.col(value_col)
    hist = (
        df.filter(v.isNotNull())
        .groupBy(*gcols, v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*gcols)
    cum = hist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wall)
    )
    frac = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(num).alias("q_num"), F.lit(den).alias("q_den")
                )
                for num, den in qs
            ]
        )
    ).alias("__q")
    expanded = cum.select(*gcols, "__v", "__cum", "__n", frac).select(
        *gcols,
        "__v",
        "__cum",
        "__q.q_num",
        "__q.q_den",
        # ⌈num·N/den⌉ in exact integer arithmetic — operands are
        # non-negative, so `div` is floor division
        F.expr("(q_num * __n + q_den - 1) div q_den").alias("__target"),
    )
    return (
        expanded.filter(F.col("__cum") >= F.col("__target"))
        .groupBy(*gcols, "q_num", "q_den")
        .agg(F.min("__v").alias("threshold"))
    )


def bucket_by_thresholds(
    df: DataFrame,
    score_col: str,
    thresholds: DataFrame,
    *,
    group_cols: Sequence[str] = (),
    bucket_col: str = "ppl_bucket",
    labels: Sequence[str] | None = None,
) -> DataFrame:
    """Label every row by where its score falls among the ``k``
    thresholds: bucket ``i`` = first threshold (ascending) with
    ``score ≤ tᵢ``, bucket ``k`` = above all of them.  With
    ``rank_thresholds`` at 1/3 and 2/3 over an LM score this is the
    CCNet head/middle/tail split (Wenzek et al. 2020 §4.3 — lower
    perplexity = "head", the cleanest third of the crawl), which
    downstream samplers consume as a quality stratum column.

    The thresholds frame (``rank_thresholds`` output, ≤ groups·k rows)
    folds to ONE array per group and broadcast-joins onto the corpus —
    the scan acquires its stratum label at map cost, no shuffle of
    corpus rows.  The bucket index is a codegen'd higher-order
    ``filter``/``size`` over the threshold array (count of thresholds
    strictly below the score), never a UDF.  NULL scores → NULL
    bucket.  ``labels`` defaults to ``b0..bk``; pass
    ``("head", "middle", "tail")`` for the CCNet naming (length must
    be k+1 — the label lookup is a bounds-safe ``get``, so a
    too-short tuple surfaces as NULL buckets in the top stratum, the
    same signal under ANSI and non-ANSI, rather than a mid-job
    array-index error; an eager length check would cost a count job
    on every call of an otherwise fully lazy operator).
    """
    gcols = list(group_cols)
    thr = thresholds.groupBy(*gcols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (
                        F.col("q_num").cast("double")
                        / F.col("q_den").cast("double")
                    ).alias("q"),
                    F.col("threshold").alias("t"),
                )
            )
        ).alias("__qt")
    )
    if labels is None:
        # only the default-label path needs k ahead of time — a count
        # over the ≤ groups·k threshold frame, not the corpus
        k = thresholds.select("q_num", "q_den").distinct().count()
        labels = tuple(f"b{i}" for i in range(k + 1))
    thr = thr.withColumn(
        "__thr", F.expr("transform(__qt, x -> x.t)")
    ).drop("__qt")
    if gcols:
        # null-safe group match (struct equality treats NULL fields
        # as equal): a NULL group is a real stratum —
        # rank_thresholds' groupBy keeps it, so its rows must find
        # their thresholds here too (r11 review fix)
        gk = lambda f: f.withColumn(
            "__gk", F.struct(*[F.col(c).alias(f"g{i}") for i, c in enumerate(gcols)])
        )
        joined = gk(df).join(
            F.broadcast(gk(thr).drop(*gcols)), on="__gk", how="left"
        ).drop("__gk")
    else:
        # constant-key equi-join, NOT crossJoin: same one-row
        # broadcast, but stream-static equi-joins are supported while
        # stream cross joins are not — so a readStream frame can
        # acquire its stratum label with stored thresholds (the
        # train-once-label-forever production shape)
        joined = df.withColumn("__one", F.lit(1)).join(
            F.broadcast(thr.withColumn("__one", F.lit(1))),
            on="__one",
            how="left",
        ).drop("__one")
    s = F.col(score_col)
    idx = F.size(F.filter(F.col("__thr"), lambda t: s > t))
    lab = F.get(
        F.array(*[F.lit(x) for x in labels]), idx.cast("int")
    )
    return joined.withColumn(
        bucket_col,
        F.when(s.isNotNull() & F.col("__thr").isNotNull(), lab),
    ).drop("__thr")


__all__ = [
    "language_id",
    "quality_features",
    "token_stats",
    "fingerprint",
    "web_artifact_features",
    "repetition_features",
    "redact_artifacts",
    "pii_features",
    "redact_pii",
    "PII_PATTERNS",
    "keep_document",
    "line_dedup",
    "chunk_documents",
    "build_vocab",
    "build_bigram_counts",
    "score_bigram_divergence",
    "prune_bigram_counts",
    "strip_html",
    "HTML_ENTITIES",
    "bigram_logprob",
    "truncate_vocab",
    "vocab_coverage",
    "unigram_logprob",
    "tfidf_terms",
    "rank_thresholds",
    "bucket_by_thresholds",
    "clean_text",
    "nfc_column",
    "CLEAN_CTRL_RE",
    "CLEAN_SPACE_RE",
    "CLEAN_NEWLINE_RE",
    "remove_duplicate_spans",
    "QUALITY_FILTER_DEFAULTS",
    "STOPWORDS",
    "normalized_text",
]
