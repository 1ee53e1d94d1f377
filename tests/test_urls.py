"""URL canonicalization + FNV-1a64 (parity cases from utils/url_test.go:8-124
and queue/item.go:17-19)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zeno_spark.functions.urls import (
    canonicalize,
    domains_crawl_pass,
    fnv1a64,
    fnv1a64_np,
    registrable_domain,
    resolve,
    url_host,
)

# independent FNV-1a64 vectors (public: RFC draft / fnv reference C impl)
FNV_VECTORS = {
    "": 0xCBF29CE484222325,
    "a": 0xAF63DC4C8601EC8C,
    "foobar": 0x85944171F73967E8,
    "http://example.com/": None,  # cross-checked numpy-vs-python below
}


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_fnv_known_vectors():
    for s, expect in FNV_VECTORS.items():
        if expect is not None:
            assert fnv1a64(s) == _signed(expect)


def test_fnv_numpy_matches_python():
    urls = pd.Series(
        ["", "a", "http://example.com/x?a=1&b=2", "https://sub.host.net/p/9#f",
         "日本語.example", "x" * 300]
    )
    got = fnv1a64_np(urls)
    want = np.array([fnv1a64(s) for s in urls], dtype=np.int64)
    assert (got == want).all()


@pytest.mark.parametrize(
    "raw,expected",
    [
        # fragment stripped, scheme/host lowered
        ("HTTP://Example.COM/Path#frag", "http://example.com/Path"),
        # query re-encoded, key order preserved (first appearance), values
        # grouped per key — a=1&b=2&a=3 -> a=1&a=3&b=2
        ("http://h.com/p?a=1&b=2&a=3", "http://h.com/p?a=1&a=3&b=2"),
        # space -> '+', unreserved [A-Za-z0-9._~-] kept (Go QueryEscape)
        ("http://h.com/p?q=a b&r=~x", "http://h.com/p?q=a+b&r=~x"),
        ("http://h.com/p?q=a/b:c", "http://h.com/p?q=a%2Fb%3Ac"),
        # IDNA punycode host (utils/url.go:24)
        ("http://日本.example/x", "http://xn--wgv71a.example/x"),
        # port preserved
        ("http://h.com:8080/p", "http://h.com:8080/p"),
        # invalid
        ("::not a url::", None),
        ("", None),
        ("/relative/only", None),
    ],
)
def test_canonicalize(raw, expected):
    assert canonicalize(raw) == expected


def test_canonicalize_reddit_exemption():
    # signature domains keep the raw query byte-for-byte (url.go:17-20)
    raw = "https://preview.redd.it/x.jpg?b=2&a=1%2B"
    assert canonicalize(raw) == raw


def test_resolve_and_host():
    assert resolve("http://h.com/a/b", "/c") == "http://h.com/c"
    assert resolve("http://h.com/a/b", "c") == "http://h.com/a/c"
    assert resolve("http://h.com/a/", "http://o.com/z") == "http://o.com/z"
    assert url_host("http://h.com:99/x") == "h.com:99"


def test_domains_crawl_pass():
    # same registrable domain -> hop-0 re-entry (outlinks.go:155-163)
    assert domains_crawl_pass("www.site1.com", "img.site1.com", 0)
    assert not domains_crawl_pass("www.site1.com", "img.site1.com", 1)
    assert not domains_crawl_pass("www.site1.com", "other.net", 0)
    # hosting provider: substring rule (outlinks.go:157-160)
    assert domains_crawl_pass("me.blogspot.com", "sub.me.blogspot.com", 0)
    assert not domains_crawl_pass("me.blogspot.com", "you.blogspot.com", 0)
    assert registrable_domain("a.b.c.com") == "c.com"
    assert registrable_domain("nodots") == ""


def test_udfs_on_spark(spark):
    from pyspark.sql import functions as F

    from zeno_spark.functions.urls import canonicalize_udf, fnv1a64_udf, host_udf

    df = spark.createDataFrame(
        [("HTTP://Example.COM/Path#frag",), ("http://h.com/p?a=1&b=2&a=3",)],
        "raw string",
    )
    rows = (
        df.withColumn("c", canonicalize_udf("raw"))
        .withColumn("h", fnv1a64_udf("c"))
        .withColumn("host", host_udf("c"))
        .collect()
    )
    assert rows[0].c == "http://example.com/Path"
    assert rows[0].h == fnv1a64("http://example.com/Path")
    assert rows[0].host == "example.com"
    assert rows[1].c == "http://h.com/p?a=1&a=3&b=2"
