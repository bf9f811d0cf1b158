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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: URLs as they appear in prose (trailing punctuation handled in
#: canonicalization, not extraction, so offsets stay simple)
URL_REGEX = r"https?://[^\s]+"

#: tracking params dropped during canonicalization
TRACKING_PARAM_REGEX = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_urls(text: Column | str) -> Column:
    """All URLs in a text column — ``array<string>``, document order."""
    return F.regexp_extract_all(_c(text), F.lit(URL_REGEX), 0)


def canonical_url(url: Column | str) -> Column:
    """Canonical form of one URL (see module docstring); NULL when the
    value does not parse as ``scheme://host…``."""
    u = F.regexp_replace(_c(url), r"""[.,;:!?)'"\]]+$""", "")
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
    "canonical_url",
    "url_dedup",
]
