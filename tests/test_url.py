"""URL canonicalization / domain curation (r13, functions/url.py) —
the CCNet/RefinedWeb/Dolma-style domain-level pass. All-Catalyst
projections; the corpus_splits driver key hash-checks them end-to-end,
these pins cover the parse edge cases."""

import pyspark.sql.functions as F
import pytest

from faiss_metal_spark.functions.url import (
    TRACKING_PARAMS,
    canonicalize_url,
    domain_blocklist_filter,
    domain_cap,
    registered_domain,
    url_domain,
)


def _canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["c"] for r in df.select(canonicalize_url("url", **kw).alias("c")).collect()
    ]


def test_canonicalize_edge_cases(spark):
    cases = {
        # scheme+host lowercase, path case preserved
        "HTTPS://WWW.Example.COM/Path/To": "https://www.example.com/Path/To",
        # default ports drop; non-default ports survive
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443": "https://a.com",
        "https://a.com:8443/x": "https://a.com:8443/x",
        # :80 on https is NOT a default port — survives
        "https://a.com:80/x": "https://a.com:80/x",
        # fragment always drops
        "https://a.com/x#frag?fake=1": "https://a.com/x",
        # tracking params drop; order of survivors preserved
        "https://a.com/?utm_source=x&q=1&fbclid=z&b=2": "https://a.com/?q=1&b=2",
        # all params tracking -> the '?' goes too
        "https://a.com/p?utm_a=1&utm_b=2&gclid=g": "https://a.com/p",
        # empty query / dangling separators
        "https://a.com/p?": "https://a.com/p",
        "https://a.com/p?&": "https://a.com/p",
        # trailing slashes at URL end collapse; root slash after host drops
        "http://x.org/p//": "http://x.org/p",
        "http://x.org/": "http://x.org",
        # userinfo survives canonicalization (lowercased with authority)
        "https://User@Host.COM/p": "https://user@host.com/p",
        # a param VALUE containing 'utm_' is not a tracking param
        "https://a.com/?q=utm_source": "https://a.com/?q=utm_source",
        # non-URL text passes through un-mangled
        "not a url": "not a url",
    }
    got = _canon(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_canonicalize_custom_tracking_params(spark):
    [g] = _canon(
        spark,
        ["https://a.com/?sid=1&q=2"],
        tracking_params=TRACKING_PARAMS + ["sid"],
    )
    assert g == "https://a.com/?q=2"
    # 'sid' must match whole param names only — 'side' survives
    [g2] = _canon(
        spark, ["https://a.com/?side=1"], tracking_params=["sid"]
    )
    assert g2 == "https://a.com/?side=1"


def test_domain_extraction(spark):
    rows = [
        ("https://sub.x.example.com/p", "sub.x.example.com", "example.com"),
        ("http://a.b.co.uk/", "a.b.co.uk", "b.co.uk"),
        ("https://user:pw@Host.COM:8080/p", "host.com", "host.com"),
        ("https://www.gov.uk/x", "www.gov.uk", "www.gov.uk"),  # 2-label host w/ cc
        ("https://x.ac.jp/", "x.ac.jp", "x.ac.jp"),
        ("ftp://files.example.org/a", "files.example.org", "example.org"),
        ("no scheme here", "", ""),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in rows], ["url"])
    got = df.select(
        url_domain("url").alias("h"), registered_domain("url").alias("d")
    ).collect()
    for (u, h, d), r in zip(rows, got):
        assert r["h"] == h, f"{u}: host {r['h']!r} != {h!r}"
        assert r["d"] == d, f"{u}: domain {r['d']!r} != {d!r}"
    # from_host form
    hf = spark.createDataFrame([("a.b.co.uk",)], ["h"]).select(
        registered_domain("h", from_host=True).alias("d")
    ).collect()[0]["d"]
    assert hf == "b.co.uk"


def test_blocklist_and_cap(spark):
    rows = [
        (i, f"https://{'evil' if i % 3 == 0 else 'fine'}.com/d/{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = domain_blocklist_filter(df, ["EVIL.com"]).collect()
    assert len(kept) == 40 and all(r["doc_id"] % 3 != 0 for r in kept)

    capped = domain_cap(df, 5)
    out = capped.collect()
    assert len(out) == 10  # 2 domains × 5
    assert "_dom" not in capped.columns
    # deterministic: same rows on re-run
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in domain_cap(df, 5).collect()
    )
    # the cap is md5(doc_id) order — replay it in python
    import hashlib

    for dom, mod in (("evil.com", 0),):
        ids = [i for i in range(60) if i % 3 == mod]
        want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
        got = sorted(
            r["doc_id"] for r in out if r["doc_id"] % 3 == mod
        )
        assert got == sorted(want)


def test_registered_domain_psl(spark):
    """PSL-backed eTLD+1 (r14): wildcard + exception + multi-label
    rules from a publicsuffix.org-style fixture of known-tricky
    suffixes the 2/3-label heuristic gets wrong."""
    from faiss_metal_spark.functions.url import registered_domain

    psl = [
        "// this is a comment",
        "",
        "com",
        "co.uk",
        "github.io",
        "blogspot.com",
        "*.ck",
        "!www.ck",
        "s3.amazonaws.com",
        "uk",
    ]
    cases = [
        # (host, expected eTLD+1 under the PSL)
        ("a.b.github.io", "b.github.io"),          # heuristic says github.io
        ("foo.blogspot.com", "foo.blogspot.com"),  # heuristic says blogspot.com
        ("x.foo.blogspot.com", "foo.blogspot.com"),
        ("www.example.co.uk", "example.co.uk"),
        ("foo.bar.ck", "foo.bar.ck"),              # wildcard *.ck: ps = bar.ck
        ("a.foo.bar.ck", "foo.bar.ck"),
        ("www.ck", "www.ck"),                       # exception !www.ck: ps = ck
        ("sub.www.ck", "www.ck"),
        ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("com", "com"),                              # host == public suffix
        ("localhost", "localhost"),                  # no rule: '*' default
        ("", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["host"])
    got = [
        r.rd
        for r in df.select(
            registered_domain("host", from_host=True, psl=psl).alias("rd")
        ).collect()
    ]
    for (h, want), g in zip(cases, got):
        assert (g or "") == want, (h, g, want)


def test_registered_domain_psl_default_unchanged(spark):
    """psl=None keeps the r13 approximation bit-for-bit (the
    corpus_splits hash depends on it)."""
    from faiss_metal_spark.functions.url import registered_domain

    urls = [
        ("https://www.example.co.uk/p",),
        ("http://a.b.c.com/x",),
        ("https://x.com",),
        ("not a url",),
    ]
    df = spark.createDataFrame(urls, ["url"])
    got = [
        (r.a or "", r.b or "")
        for r in df.select(
            registered_domain("url").alias("a"),
            registered_domain("url", psl=None).alias("b"),
        ).collect()
    ]
    want = ["example.co.uk", "c.com", "x.com", ""]
    assert [a for a, _ in got] == want
    assert [b for _, b in got] == want
