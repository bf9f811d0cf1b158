"""URL extraction, canonicalization, and URL-level dedup.

URL dedup is the FIRST dedup tier in a web-crawl pipeline (CommonCrawl
processing dedupes fetched URLs before any content hashing): two crawls
of ``HTTP://WWW.Example.com:443/a/?utm_source=x&b=1#frag`` and
``https://example.com/a?b=1`` are the same page, and canonicalizing
before the groupBy turns that into one hash aggregate instead of a
content-dedup pass over duplicate fetches.

Everything here is pure built-in column expressions (``regexp_extract``
/ ``filter`` / ``array_sort`` — codegen'd, no Python), deliberately
restricted to regex features with identical semantics in ANSI-SQL
engines so results are differentially testable (``tests/test_urls.py``
pins Spark ≡ DuckDB on the canonicalization corpus).

Canonical form applied by :func:`canonical_url`:

* scheme + host lowercased; ``www.`` prefix and default ports
  (``:80`` http, ``:443`` https) stripped;
* fragment dropped;
* tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``), remaining params sorted so param order never
  splits a URL into two keys;
* trailing slashes on the path stripped;
* non-URL input (no ``scheme://host``) → NULL, so malformed rows never
  collide in a dedup group.

:func:`canonical_url` is deliberately **strip-free**: a structured URL
column may legitimately end in ``)`` (``.../Foo_(bar)`` on Wikipedia)
or ``'``, and stripping there would canonicalize a distinct page onto
its truncated sibling — a false-positive dedup in the very first tier.
Prose-trailing punctuation (``see https://x.com/a.``) is a property of
the *extraction* context, so :func:`trim_prose_punctuation` lives as
its own paren-balanced column function and :func:`extract_urls`
applies it per element by default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: URLs as they appear in prose (trailing punctuation handled by
#: :func:`trim_prose_punctuation` after extraction, so offsets stay simple)
URL_REGEX = r"https?://[^\s]+"

#: tracking params dropped during canonicalization
TRACKING_PARAM_REGEX = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="

#: prose punctuation stripped from extracted-URL tails.  ``)`` is NOT in
#: this class — closing parens are stripped only when unbalanced (see
#: :func:`trim_prose_punctuation`), so ``.../Foo_(bar)`` survives.
_PROSE_TAIL = r"""[.,;:!?'"\]]+$"""


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def trim_prose_punctuation(url: Column | str) -> Column:
    """Strip prose-trailing punctuation off a URL extracted from text.

    Two-pass: (1) strip trailing ``.,;:!?'"]`` runs, (2) strip trailing
    ``)`` only in excess of the URL's own ``(`` count (the Markdown /
    GitHub autolinker rule), (3) strip punctuation again for tails like
    ``).``.  ``https://en.wikipedia.org/wiki/Foo_(bar)`` is untouched;
    ``https://x.com/a).`` → ``https://x.com/a``.  Pure codegen — the
    paren excess is two ``replace`` length diffs, no UDF.
    """
    b1 = F.regexp_replace(_c(url), _PROSE_TAIL, "")
    n_open = F.length(b1) - F.length(F.replace(b1, F.lit("(")))
    n_close = F.length(b1) - F.length(F.replace(b1, F.lit(")")))
    trail = F.length(F.regexp_extract(b1, r"(\)+)$", 1))
    k = F.least(trail, F.greatest(F.lit(0), n_close - n_open))
    b2 = F.substring(b1, F.lit(1), F.length(b1) - k)
    return F.regexp_replace(b2, _PROSE_TAIL, "")


def extract_urls(text: Column | str, *, trim: bool = True) -> Column:
    """All URLs in a text column — ``array<string>``, document order.

    ``trim=True`` (default) applies :func:`trim_prose_punctuation` per
    element; pass ``trim=False`` for raw regex spans.
    """
    raw = F.regexp_extract_all(_c(text), F.lit(URL_REGEX), 0)
    if not trim:
        return raw
    return F.transform(raw, trim_prose_punctuation)


def canonical_url(url: Column | str) -> Column:
    """Canonical form of one URL (see module docstring); NULL when the
    value does not parse as ``scheme://host…``.

    Strip-free by design: trailing ``)``/``'`` are legitimate URL path
    characters (``.../Foo_(bar)``), so prose-punctuation handling
    belongs to the extraction context (:func:`trim_prose_punctuation`),
    never here — stripping here would collapse a genuinely distinct
    page onto its truncated form.
    """
    u = _c(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    nowww = F.regexp_replace(hostport, r"^www\.", "")
    # default-port strip is scheme-conditional: :443 on http (or :80
    # on https) is a real non-default origin and must stay distinct
    host = (
        F.when(
            scheme == "http", F.regexp_replace(nowww, r":80$", "")
        )
        .when(scheme == "https", F.regexp_replace(nowww, r":443$", ""))
        .otherwise(nowww)
    )
    rest = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike(TRACKING_PARAM_REGEX),
        )
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, path, qpart),
    )


def url_dedup(
    df: DataFrame,
    *,
    id_col: str,
    url_col: str,
) -> DataFrame:
    """Drop list over canonical-URL collisions: for every group of rows
    whose URLs canonicalize identically, keep the lowest id.

    One shuffle (hash partition on the canonical key) — the standard
    min-over-window drop-list shape shared with ``dedup_exact``.  Rows
    whose URL fails to parse canonicalize to NULL and are never
    grouped.  Output: ``drop_id, canonical, kept_id``, carrying the id
    column's OWN type — "lowest id" is numeric order for numeric ids
    and lexicographic for string ids (a silent ``cast('long')`` here
    would NULL every string id and return an empty drop list).
    """
    from pyspark.sql.window import Window

    canon = df.select(
        F.col(id_col).alias("__id"),
        canonical_url(F.col(url_col)).alias("canonical"),
    ).filter(F.col("canonical").isNotNull() & F.col("__id").isNotNull())
    w = Window.partitionBy("canonical")
    marked = canon.withColumn("__keep", F.min("__id").over(w))
    return marked.filter(F.col("__id") != F.col("__keep")).select(
        F.col("__id").alias("drop_id"),
        "canonical",
        F.col("__keep").alias("kept_id"),
    )


__all__ = [
    "URL_REGEX",
    "TRACKING_PARAM_REGEX",
    "extract_urls",
    "trim_prose_punctuation",
    "canonical_url",
    "url_dedup",
]
