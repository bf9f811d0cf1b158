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


def host_of(url: Column | str) -> Column:
    """Grouping host of a URL: lowercased hostname with the ``www.``
    prefix and ANY ``:port`` stripped; NULL when the value does not
    parse as ``scheme://host…``.

    This is the DOMAIN-CAP key, deliberately coarser than
    :func:`canonical_url`'s host handling (which keeps non-default
    ports distinct, because a different origin is a different page):
    for per-site frequency capping ``example.com:8080`` and
    ``example.com`` are the same publisher, so the port never splits
    a site into two quota pools.  Without a public-suffix list the
    host itself is the site key — subdomains count separately, the
    conservative direction (a cap key that is too fine never lets one
    site exceed its quota).
    """
    u = _c(url)
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":[0-9]+$", ""
    )
    return F.when(host != "", host)


def cap_per_domain(
    df: DataFrame,
    *,
    id_col: str,
    url_col: str | None = None,
    host_col: str | None = None,
    max_per_domain: int,
    seed: int = 42,
    portable: bool = False,
    salt_buckets: int = 16,
    domain_col: str = "domain",
) -> DataFrame:
    """Per-site frequency cap: keep at most ``max_per_domain``
    documents per host, chosen by a deterministic hash lottery — the
    C4/RefinedWeb "domain cap" tier that stops a single template-heavy
    site from dominating a crawl corpus (Raffel et al. 2020 §2.2,
    Penedo et al. 2023 §3.1 run this between URL dedup and content
    dedup).

    Selection is a pure function of (id, seed): rows order by
    ``hash(id, seed)`` (ties broken by id) within their host, and the
    first ``max_per_domain`` survive — a uniform random-looking N-of-M
    sample per site that is reproducible across runs, partitionings,
    and cluster sizes, unlike "first N by id" (which biases toward
    early crawl order) or ``rand()`` (which is neither stable nor
    replayable).  ``portable=True`` selects the md5-prefix60 order
    hash so any SQL engine can replay the exact survivor set.

    Scale shape: the rank-within-host window is the one shuffle, and a
    mega-site (the exact skew this operator exists to fix) would pin
    its whole row set on one task — so ranking is two-stage, the
    standard skew-safe top-N: stage 1 ranks within ``(host,
    pmod(order_hash, salt_buckets))`` and keeps ≤ ``max_per_domain``
    per salt slice (each true global top row is top-≤cap within its
    slice, so no survivor is lost); stage 2 re-ranks the ≤
    ``salt_buckets × cap`` finalists per host — a bounded frame no
    matter how large the site.  Result is IDENTICAL to the
    single-window rank for every ``salt_buckets ≥ 1`` (pinned by
    tests).

    Rows whose URL does not parse (NULL host) are passed through
    uncapped — no-URL documents are not a "site" and C4 does not drop
    them at this tier.  Output: all input columns + ``domain_col``.
    Exactly one of ``url_col`` / ``host_col`` must name the source.
    """
    if (url_col is None) == (host_col is None):
        raise ValueError(
            "cap_per_domain: pass exactly one of url_col / host_col"
        )
    if max_per_domain < 1:
        raise ValueError("cap_per_domain: max_per_domain must be >= 1")
    if salt_buckets < 1:
        raise ValueError("cap_per_domain: salt_buckets must be >= 1")
    from data_toolz_spark.operators._util import skew_safe_top_n
    from data_toolz_spark.operators.sampling import _order_hash

    dom = (
        host_of(F.col(url_col)) if url_col is not None
        # '' is not a site: normalize to NULL so both input modes
        # share the pass-through rule (host_of never yields '' — an
        # upstream producing '' instead of NULL must not get a shared
        # phantom domain capped to max_per_domain rows)
        else F.when(F.col(host_col) != "", F.col(host_col))
    )
    base = df.withColumn(domain_col, dom)
    free = base.filter(F.col(domain_col).isNull())
    sited = base.filter(F.col(domain_col).isNotNull()).withColumn(
        "__ok", _order_hash(F.col(id_col), seed, portable)
    )
    kept = skew_safe_top_n(
        sited,
        partition_by=[domain_col],
        order_by=[F.col("__ok"), F.col(id_col)],
        n=max_per_domain,
        salt=F.col("__ok"),
        salt_buckets=salt_buckets,
    ).drop("__ok")
    return kept.unionByName(free)


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
    "host_of",
    "cap_per_domain",
    "url_dedup",
]
