"""URL canonicalization + hashing, semantics-matched to the reference.

Reference semantics being reproduced (file:line into /root/reference):

* ``utils/url.go:14-45`` ``URLToString`` — re-encode the query (grouped by
  key, keys NOT sorted), IDNA/punycode the host, with three Reddit
  signature domains exempt from query re-encoding.  NOTE: the reference
  iterates a Go map for the key order, which is *randomized per run*; we
  fix key order to first appearance in the raw query, which is the only
  deterministic reading of "modified to not sort" and is required for a
  stable url_hash.
* ``utils/url.go:49-74`` ``encodeQuery`` — values grouped per key in
  appearance order, Go ``url.QueryEscape`` escaping (space -> '+',
  unreserved = [A-Za-z0-9._~-]); Python's ``quote_plus`` matches.
* ``utils/url.go:78-86`` ``MakeAbsolute`` — resolve relative against base.
* ``utils/url.go:88-94`` ``RemoveFragments``.
* ``utils/url.go:97-112`` ``DedupeURLs`` — also drops non-http(s).
* ``queue/item.go:17-19`` — ``Hash`` = FNV-1a 64 over the canonical URL
  string.

Everything is exposed both as plain-Python helpers (used by the oracle,
zeno_spark/oracle.py, so Spark and oracle share ONE canonicalization —
any bug cancels out, keeping the comparison honest about *dataflow*) and
as Arrow-batched pandas UDFs (used by the Spark pipeline; no per-row
Python at the Spark API surface).
"""

from __future__ import annotations

import functools
from urllib.parse import parse_qsl, quote_plus, urljoin, urlsplit, urlunsplit

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reddit signature domains whose query strings must not be re-encoded
# (utils/url.go:17-20).
_QUERY_EXEMPT_HOSTS = frozenset(
    {"external-preview.redd.it", "styles.redditmedia.com", "preview.redd.it"}
)

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_U64 = 1 << 64


# ---------------------------------------------------------------------------
# plain-Python canonicalization (shared by oracle + UDFs)
# ---------------------------------------------------------------------------

def _idna_host(host: str) -> str:
    """IDNA/punycode a host[:port] like utils/url.go:24-42."""
    if not host:
        return host
    if host.isascii():
        return host.lower()
    port = ""
    h = host
    if ":" in host and not host.startswith("["):
        h, _, port = host.rpartition(":")
        port = ":" + port
    try:
        import idna

        return idna.encode(h, uts46=True).decode("ascii") + port
    except Exception:
        try:
            return h.encode("idna").decode("ascii") + port
        except Exception:
            return host  # reference logs a warning and keeps the host as-is


def _encode_query(raw_query: str) -> str:
    """Go encodeQuery (url.go:49-74): group values by key, keys in first-
    appearance order (see module docstring), QueryEscape both sides."""
    if not raw_query:
        return ""
    pairs = parse_qsl(raw_query, keep_blank_values=True)
    grouped: dict[str, list[str]] = {}
    for k, v in pairs:  # dict preserves first-appearance key order
        grouped.setdefault(k, []).append(v)
    parts = []
    for k, vs in grouped.items():
        ke = quote_plus(k)
        for v in vs:
            parts.append(f"{ke}={quote_plus(v)}")
    return "&".join(parts)


@functools.lru_cache(maxsize=65536)
def canonicalize(url: str) -> str | None:
    """Canonical string form of a URL (URLToString semantics), fragment
    stripped (RemoveFragments is always applied before hashing in the
    reference dataflow: assets.go:449-456, outlinks.go:39-50).

    Returns None for unparsable/invalid URLs (skip-on-parse-error,
    queue/item.go:76-80).
    """
    if not url:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    if not parts.netloc:
        return None
    host = _idna_host(parts.netloc)
    query = parts.query
    hostname = host.rsplit(":", 1)[0] if not host.startswith("[") else host
    if hostname not in _QUERY_EXEMPT_HOSTS:
        query = _encode_query(query)
    return urlunsplit((parts.scheme.lower(), host, parts.path, query, ""))


def url_host(url: str) -> str:
    """Host[:port] — the queue index key (enqueue.go:203 uses URL.Host)."""
    try:
        return urlsplit(url).netloc
    except ValueError:
        return ""


def url_scheme(url: str) -> str:
    try:
        return urlsplit(url).scheme.lower()
    except ValueError:
        return ""


def resolve(base: str, ref: str) -> str:
    """MakeAbsolute (url.go:78-86)."""
    try:
        return urljoin(base, ref)
    except ValueError:
        return ref


# Hosting providers where --domains-crawl stays on the subdomain — the
# exact 25-entry list from crawl/outlinks.go:103-129.
_SUBDOMAIN_ONLY = frozenset(
    {
        "forumactif.com", "canalblog.com", "blogspot.com", "wordpress.com",
        "tumblr.com", "weebly.com", "jimdo.com", "webnode.com", "yola.com",
        "strikingly.com", "site123.com", "simplesite.com", "webstarts.com",
        "webflow.com", "weblium.com", "webself.net", "one.com", "free.fr",
        "000webhost.com", "hostinger.com", "hostgator.com", "bluehost.com",
        "godaddy.com", "siteground.com", "ionos.com",
    }
)


def registrable_domain(host: str) -> str:
    """Last two dot-labels of the host — exactly what domainsCrawlPass
    computes (outlinks.go:140-154); NOT a public-suffix lookup.  Hosts
    with <2 labels return "" (the reference refuses the pass)."""
    parts = host.split(".")
    if len(parts) < 2:
        return ""
    return parts[-2] + "." + parts[-1]


def domains_crawl_pass(origin_host: str, outlink_host: str, origin_hop: int) -> bool:
    """F8: does an outlink of a hop-0 seed re-enter at hop 0?
    Semantics of crawl/outlinks.go:100-164 (assumes --domains-crawl on):
    compare last-two-label domains; for the 25 hosting providers the
    outlink host must *contain* the origin host (substring, as in the
    reference's strings.Contains)."""
    if origin_hop != 0:
        return False
    od = registrable_domain(origin_host)
    ld = registrable_domain(outlink_host)
    if not od or not ld:
        return False
    if od in _SUBDOMAIN_ONLY:
        return origin_host in outlink_host
    return od == ld


def fnv1a64(s: str) -> int:
    """FNV-1a 64 (hash/fnv in Go; queue/item.go:18-19) -> signed int64."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) % _U64
    return h - _U64 if h >= _U64 // 2 else h


# ---------------------------------------------------------------------------
# vectorized kernels
# ---------------------------------------------------------------------------

def fnv1a64_np(strings: pd.Series) -> np.ndarray:
    """Vectorized FNV-1a 64: pad to a (n, maxlen) byte matrix, then fold
    column-by-column with uint64 wraparound — O(maxlen) numpy passes
    instead of a per-row Python loop."""
    encoded = strings.fillna("").astype(str).map(lambda s: s.encode("utf-8"))
    n = len(encoded)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(encoded):
        buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    for j in range(maxlen):
        mask = lens > j
        if not mask.any():
            break
        hj = h[mask]
        h[mask] = (hj ^ buf[mask, j].astype(np.uint64)) * prime
    return h.view(np.int64)


def _map_unique(series: pd.Series, fn) -> pd.Series:
    """Apply fn once per distinct value (URL batches repeat hosts/bases a
    lot; this keeps the Python part sublinear in batch size)."""
    uniq = series.dropna().unique()
    table = {u: fn(u) for u in uniq}
    return series.map(table)


# ---------------------------------------------------------------------------
# pandas UDFs (the Spark surface)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return _map_unique(urls, canonicalize)


@F.pandas_udf(T.LongType())
def fnv1a64_udf(urls: pd.Series) -> pd.Series:
    return pd.Series(fnv1a64_np(urls), index=urls.index)


@F.pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return _map_unique(urls, url_host)


@F.pandas_udf(T.StringType())
def scheme_udf(urls: pd.Series) -> pd.Series:
    return _map_unique(urls, url_scheme)


@F.pandas_udf(T.StringType())
def resolve_udf(bases: pd.Series, refs: pd.Series) -> pd.Series:
    frame = pd.DataFrame({"b": bases, "r": refs})
    uniq = frame.drop_duplicates()
    table = {
        (b, r): resolve(b, r) if isinstance(r, str) else None
        for b, r in zip(uniq["b"], uniq["r"])
    }
    return pd.Series(
        [table[(b, r)] for b, r in zip(frame["b"], frame["r"])], index=frame.index
    )


@F.pandas_udf(T.StringType())
def registrable_domain_udf(hosts: pd.Series) -> pd.Series:
    return _map_unique(hosts, registrable_domain)


def reg_domain_col(host_col):
    """Native-Column registrable domain (last two dot-labels, exactly
    registrable_domain()): keeps the F8 predicate inside codegen."""
    parts = F.split(host_col, r"\.")
    return F.when(
        F.size(parts) >= 2, F.concat_ws(".", F.slice(parts, -2, 2))
    ).otherwise(F.lit(""))


# Fused URL pipeline: resolve -> canonicalize -> hash -> host in ONE
# Arrow roundtrip (chaining separate pandas UDFs costs one serialize/
# deserialize pass each; at bench scale the fused form cut the extract
# stage ~4x).  A null/empty base means "ref is already absolute".
_ENRICH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
    ]
)


@F.pandas_udf(_ENRICH_SCHEMA)
def enrich_url_udf(bases: pd.Series, refs: pd.Series) -> pd.DataFrame:
    frame = pd.DataFrame({"b": bases, "r": refs})
    uniq = frame.drop_duplicates()
    canon_map: dict[tuple, str | None] = {}
    for b, r in zip(uniq["b"], uniq["r"]):
        if not isinstance(r, str):
            canon_map[(b, r)] = None
            continue
        absu = resolve(b, r) if isinstance(b, str) and b else r
        canon_map[(b, r)] = canonicalize(absu)
    canon = pd.Series(
        [canon_map[(b, r)] for b, r in zip(frame["b"], frame["r"])],
        index=frame.index,
    )
    # hash the distinct canonical urls once, vectorized
    uniq_canon = canon.dropna().unique()
    hashes = fnv1a64_np(pd.Series(uniq_canon))
    hash_map = dict(zip(uniq_canon, hashes))
    host_map = {u: url_host(u) for u in uniq_canon}
    return pd.DataFrame(
        {
            "url": canon,
            "url_hash": canon.map(hash_map),
            "host": canon.map(host_map),
        }
    )
