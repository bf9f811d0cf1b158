"""URL canonicalization + dedup: Spark ≡ DuckDB differential over a
hand-built corpus of canonicalization cases, plus drop-list semantics.

The synthetic documents table contains no URLs, so attestation here is
the differential test — the same pure-regex formula evaluated by both
engines must agree byte-for-byte on every case.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_toolz_spark.operators.urls import (
    canonical_url,
    extract_urls,
    url_dedup,
)

CASES = [
    # (id, raw url)
    (1, "HTTP://WWW.Example.com:80/a/b/?utm_source=x&b=1#frag"),
    (2, "http://example.com/a/b?b=1"),
    (3, "https://Example.COM:443/"),
    (4, "https://example.com"),
    (5, "https://example.com/path/?z=2&a=1"),
    (6, "https://example.com/path?a=1&z=2"),
    (7, "https://example.com/path?a=1&z=2&fbclid=zzz&gclid=q"),
    (8, "https://sub.example.com/path"),
    (9, "not a url"),
    (10, "ftp://example.com/file"),  # non-http scheme still parses
    (11, "https://example.com/x)."),  # prose tail — canonical keeps it
    (12, "https://example.com/x"),
    (13, "http://example.com:8080/x"),  # non-default port kept
    (14, "https://example.com/?utm_campaign=a&utm_medium=b"),
    (15, "https://example.com/a//"),
    (16, "https://example.com/search?q=a+b&ref=home"),
]

# the same formula, DuckDB dialect
DUCK_CANON = r"""
WITH s AS (
  SELECT id, url AS u FROM t
), p0 AS (
  SELECT id, u,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(
      lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
      '^www\.', '') AS nowww,
    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) AS rest
  FROM s
), p AS (
  SELECT id, u, scheme, rest,
    CASE WHEN scheme = 'http' THEN regexp_replace(nowww, ':80$', '')
         WHEN scheme = 'https' THEN regexp_replace(nowww, ':443$', '')
         ELSE nowww END AS host
  FROM p0
), q AS (
  SELECT id, scheme, host,
    regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
    list_sort(list_filter(
      string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
      x -> x <> '' AND NOT regexp_matches(
        x, '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=')
    )) AS params
  FROM p
)
SELECT id,
  CASE WHEN scheme <> '' AND host <> ''
       THEN scheme || '://' || host || path ||
            CASE WHEN len(params) > 0
                 THEN '?' || array_to_string(params, '&') ELSE '' END
  END AS canonical
FROM q ORDER BY id
"""


def test_canonical_matches_duckdb(spark):
    df = spark.createDataFrame(CASES, ["id", "url"])
    got = {
        r["id"]: r["canonical"]
        for r in df.select(
            "id", canonical_url("url").alias("canonical")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", CASES)
    want = dict(con.execute(DUCK_CANON).fetchall())
    assert got == want


def test_canonical_specific_forms(spark):
    df = spark.createDataFrame(CASES, ["id", "url"])
    got = {
        r["id"]: r["canonical"]
        for r in df.select(
            "id", canonical_url("url").alias("canonical")
        ).collect()
    }
    assert got[1] == "http://example.com/a/b?b=1"  # == case 2
    assert got[1] == got[2]
    assert got[3] == "https://example.com"
    assert got[3] == got[4]
    assert got[5] == got[6] == "https://example.com/path?a=1&z=2"
    assert got[7] == got[6]  # tracking params dropped
    assert got[8] == "https://sub.example.com/path"  # subdomain kept
    assert got[9] is None
    assert got[10] == "ftp://example.com/file"
    # canonical_url is strip-free: a prose tail is a DIFFERENT path.
    # trim_prose_punctuation (the extraction context) is what maps 11
    # onto 12 — see test_trim_prose_punctuation.
    assert got[11] == "https://example.com/x)."
    assert got[12] == "https://example.com/x"
    assert got[13] == "http://example.com:8080/x"
    assert got[14] == "https://example.com"
    assert got[16] == "https://example.com/search?q=a+b"


def test_url_dedup_drop_list(spark):
    df = spark.createDataFrame(CASES, ["id", "url"])
    drops = {
        r["drop_id"]: r["kept_id"]
        for r in url_dedup(df, id_col="id", url_col="url").collect()
    }
    # groups: {1,2}, {3,4,14}, {5,6,7}.  11 and 12 no longer collide:
    # canonical_url is strip-free, so the prose-tailed 11 is distinct.
    assert drops == {2: 1, 4: 3, 14: 3, 6: 5, 7: 5}


def test_extract_urls(spark):
    df = spark.createDataFrame(
        [(1, "see https://a.com/x and http://b.org, ok"), (2, "none")],
        ["id", "text"],
    )
    got = {r["id"]: r["u"] for r in df.select(
        "id", extract_urls("text").alias("u")
    ).collect()}
    assert got[1] == ["https://a.com/x", "http://b.org"]
    assert got[2] == []
    raw = {r["id"]: r["u"] for r in df.select(
        "id", extract_urls("text", trim=False).alias("u")
    ).collect()}
    assert raw[1] == ["https://a.com/x", "http://b.org,"]


def test_trim_prose_punctuation(spark):
    from data_toolz_spark.operators.urls import trim_prose_punctuation

    cases = [
        (1, "https://example.com/x).", "https://example.com/x"),
        (2, "https://en.wikipedia.org/wiki/Foo_(bar)",
            "https://en.wikipedia.org/wiki/Foo_(bar)"),  # balanced: keep
        (3, "https://en.wikipedia.org/wiki/Foo_(bar)).",
            "https://en.wikipedia.org/wiki/Foo_(bar)"),  # excess ) goes
        (4, "https://x.com/a,", "https://x.com/a"),
        (5, "https://x.com/a.).", "https://x.com/a"),
        (6, "https://x.com/q?a=(1)", "https://x.com/q?a=(1)"),
        (7, "https://x.com/plain", "https://x.com/plain"),
        (8, 'https://x.com/quoted"', "https://x.com/quoted"),
        (9, "https://x.com/))", "https://x.com/"),  # two excess parens
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], ["id", "url"]
    )
    got = {r["id"]: r["t"] for r in df.select(
        "id", trim_prose_punctuation("url").alias("t")
    ).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_dedup_single_shuffle_codegen(spark):
    df = spark.createDataFrame(CASES, ["id", "url"])
    plan = (
        url_dedup(df, id_col="id", url_col="url")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan  # pure expressions, no UDFs


def test_randomized_differential(spark):
    """Fuzz the canonicalization formula: 150 structured-random URLs
    (plus garbage) must canonicalize identically in Spark and DuckDB —
    any regex-semantics divergence between the engines shows up here
    before it can reach a production oracle."""
    import random

    rng = random.Random(99)
    schemes = ["http", "https", "HTTP", "Https", "ftp"]
    hosts = ["Example.com", "sub.test.ORG", "www.Data.io", "a-b.co"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b/", "/x//", "/p.q"]
    params = [
        "a=1", "z=2", "utm_source=x", "utm_campaign=", "fbclid=abc",
        "ref=home", "q=a+b", "", "gclid=1",
    ]
    frags = ["", "#frag", "#a/b"]
    tails = ["", ".", ",", ")."]

    rows = []
    for i in range(150):
        if i % 10 == 9:
            rows.append((i, rng.choice(["not a url", "", "http//x", "x"])))
            continue
        q = "&".join(
            rng.sample(params, rng.randint(0, 4))
        )
        rows.append(
            (
                i,
                rng.choice(schemes)
                + "://"
                + rng.choice(hosts)
                + rng.choice(ports)
                + rng.choice(paths)
                + ("?" + q if q else "")
                + rng.choice(frags)
                + rng.choice(tails),
            )
        )

    df = spark.createDataFrame(rows, ["id", "url"])
    got = {
        r["id"]: r["canonical"]
        for r in df.select(
            "id", canonical_url("url").alias("canonical")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.execute(DUCK_CANON).fetchall())
    assert got == want


def test_url_dedup_string_ids(spark):
    """String ids must dedup via lexicographic min, not silently
    NULL-cast into an empty drop list."""
    rows = [
        ("doc-b", "https://example.com/x"),
        ("doc-a", "https://EXAMPLE.com/x"),
        ("doc-c", "https://other.com/y"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    drops = {
        r["drop_id"]: r["kept_id"]
        for r in url_dedup(df, id_col="id", url_col="url").collect()
    }
    assert drops == {"doc-b": "doc-a"}


def test_port_strip_is_scheme_conditional(spark):
    rows = [
        (1, "http://example.com:443/x"),   # real non-default origin
        (2, "https://example.com:80/x"),   # ditto
        (3, "ftp://example.com:80/x"),     # non-http: keep any port
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {
        r["id"]: r["canonical"]
        for r in df.select(
            "id", canonical_url("url").alias("canonical")
        ).collect()
    }
    assert got[1] == "http://example.com:443/x"
    assert got[2] == "https://example.com:80/x"
    assert got[3] == "ftp://example.com:80/x"


def test_canonicalization_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — re-processing an
    already-canonical URL column (a re-run over a partially processed
    dataset) must be a no-op."""
    rows = CASES + [(100 + i, u) for i, u in enumerate([
        "https://www.a.com:443/p/?utm_source=1&b=2&a=3#f).",
        "HTTP://B.ORG:80//",
    ])]
    df = spark.createDataFrame(rows, ["id", "url"])
    once = df.select(
        "id", canonical_url("url").alias("c1")
    ).filter(F.col("c1").isNotNull())
    twice = once.select(
        "id", "c1", canonical_url("c1").alias("c2")
    )
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad


# ---------------------------------------------------------------------------
# host_of + cap_per_domain (r10: per-site frequency capping)
# ---------------------------------------------------------------------------


def test_host_of_forms(spark):
    rows = [
        (1, "https://WWW.Example.com:8080/a"),
        (2, "http://sub.test.org/x"),
        (3, "https://example.com:443/y"),
        (4, "not a url"),
        (5, "https://example.com"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    from data_toolz_spark.operators.urls import host_of

    got = {
        r["id"]: r["h"]
        for r in df.select("id", host_of("url").alias("h")).collect()
    }
    assert got[1] == "example.com"  # www + ANY port stripped
    assert got[2] == "sub.test.org"  # subdomain kept (finer is safe)
    assert got[3] == "example.com"
    assert got[4] is None
    assert got[5] == "example.com"


def _cap_corpus(spark, n=400):
    """n docs over 3 sites with very skewed counts + some no-URL rows."""
    rows = []
    for i in range(n):
        if i % 10 == 9:
            url = "nope"  # unparseable → uncapped pass-through
        elif i % 4 == 0:
            url = f"https://www.big.com/p/{i}"
        elif i % 4 in (1, 2):
            url = f"http://big.com:80/q/{i}"  # same site as above
        else:
            url = f"https://small.org/{i}"
        rows.append((i, url))
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_cap_per_domain_counts_and_determinism(spark):
    from data_toolz_spark.operators.urls import cap_per_domain

    df = _cap_corpus(spark)
    kept = cap_per_domain(
        df, id_col="doc_id", url_col="url", max_per_domain=25, seed=7
    )
    counts = {
        r["domain"]: r["n"]
        for r in kept.groupBy("domain").agg(
            F.count("*").alias("n")
        ).collect()
    }
    # big.com has 300 rows → capped to 25; small.org has 60 → capped
    # to 25; the 40 unparseable rows pass through with NULL domain
    assert counts["big.com"] == 25
    assert counts["small.org"] == 25
    assert counts[None] == 40
    # deterministic: a second run (different partitioning) keeps the
    # SAME ids, not just the same counts
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_domain(
            df.repartition(13),
            id_col="doc_id",
            url_col="url",
            max_per_domain=25,
            seed=7,
        ).collect()
    )
    assert a == b


def test_cap_per_domain_salt_invariance(spark):
    """The skew-safe two-stage rank is semantically invisible: every
    salt_buckets value yields the identical survivor set."""
    from data_toolz_spark.operators.urls import cap_per_domain

    df = _cap_corpus(spark, n=200)
    base = None
    for s in (1, 4, 32):
        ids = sorted(
            r["doc_id"]
            for r in cap_per_domain(
                df,
                id_col="doc_id",
                url_col="url",
                max_per_domain=11,
                seed=3,
                salt_buckets=s,
            ).collect()
        )
        if base is None:
            base = ids
        assert ids == base, f"salt_buckets={s} changed the survivor set"


def test_cap_per_domain_portable_python_twin(spark):
    """portable=True survivor set replayed exactly by hashlib."""
    import hashlib

    from data_toolz_spark.operators.urls import cap_per_domain

    df = _cap_corpus(spark, n=120)
    kept = cap_per_domain(
        df,
        id_col="doc_id",
        url_col="url",
        max_per_domain=5,
        seed=11,
        portable=True,
    )
    got = sorted(
        r["doc_id"] for r in kept.filter(
            F.col("domain").isNotNull()
        ).collect()
    )

    def h(i):
        return int(hashlib.md5(f"{i}|11".encode()).hexdigest()[:15], 16)

    sites: dict[str, list[int]] = {}
    for i in range(120):
        if i % 10 == 9:
            continue
        dom = "big.com" if i % 4 in (0, 1, 2) else "small.org"
        sites.setdefault(dom, []).append(i)
    want = sorted(
        i
        for ids in sites.values()
        for i in sorted(ids, key=lambda x: (h(x), x))[:5]
    )
    assert got == want


def test_cap_per_domain_host_col_and_validation(spark):
    from data_toolz_spark.operators.urls import cap_per_domain

    df = spark.createDataFrame(
        [(i, "a.com" if i < 8 else "b.com") for i in range(10)],
        ["doc_id", "site"],
    )
    kept = cap_per_domain(
        df, id_col="doc_id", host_col="site", max_per_domain=3
    )
    counts = {
        r["domain"]: r["n"]
        for r in kept.groupBy("domain").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts == {"a.com": 3, "b.com": 2}
    with pytest.raises(ValueError):
        cap_per_domain(df, id_col="doc_id", max_per_domain=3)
    with pytest.raises(ValueError):
        cap_per_domain(
            df,
            id_col="doc_id",
            host_col="site",
            url_col="site",
            max_per_domain=3,
        )
    with pytest.raises(ValueError):
        cap_per_domain(
            df, id_col="doc_id", host_col="site", max_per_domain=0
        )


def test_cap_per_domain_empty_host_passes_through(spark):
    """r11 (advice): '' in host_col is not a site — it must share the
    NULL pass-through rule (host_of never yields ''), not get capped
    as one shared phantom domain."""
    from data_toolz_spark.operators.urls import cap_per_domain

    rows = [(i, "") for i in range(10)] + [
        (100 + i, "a.com") for i in range(10)
    ] + [(200, None)]
    df = spark.createDataFrame(rows, ["doc_id", "site"])
    kept = cap_per_domain(
        df, id_col="doc_id", host_col="site", max_per_domain=3
    )
    got = kept.collect()
    # all 10 ''-host rows AND the NULL row pass uncapped; a.com capped
    assert len(got) == 10 + 3 + 1
    assert all(
        r["domain"] is None for r in got if r["doc_id"] < 100 or r["doc_id"] == 200
    )
