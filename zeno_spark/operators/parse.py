"""Content extractors P1-P12 (SURVEY §2.6): fetched body bytes -> URL
lists, as one Arrow-batched UDF family.

The crawl pipeline's sandbox corpus models extractor OUTPUT as the
``links`` table (fixtures.py), because the synthetic web stores edges,
not bodies.  These extractors are the real thing for deployments where
``fetched.bytes`` holds page content; they reproduce the reference's
extraction semantics with stdlib parsers (html.parser / xml.etree /
json / re — no lxml in this container):

  P1  HTML outlinks   — <a href>, <iframe src>, <ref target>, plus a
                        relaxed regex URL scan of the text body
                        (outlinks.go:13-51, utils.go:59-79; xurls
                        .Relaxed ~ _URL_RE here)
  P2  HTML assets     — per-tag attribute harvest incl. srcset/data-*
                        lazy variants, <source>, <script src>, <style>
                        url(...), inline style background, <link href>
                        (rel=alternate skipped), <meta href/content>
                        (assets.go:182-457)
  P3  <base> handling — base overrides the document URL for relative
                        resolution (capture.go:555-578)
  P7  Link header     — RFC-8288-ish "<url>; rel=x" parse
                        (link_header.go:20-63)
  P8  XML / sitemap   — leaf string values starting "http"; sitemap
                        detection by namespace/root marker routes links
                        to outlinks vs assets (extractor/xml.go:12-47,
                        capture.go:461-480)
  P9  JSON            — recursive walk collecting absolute http(s) URLs
                        (extractor/json.go:10-64)
  P10 M3U8            — media segment + variant URIs, resolved against
                        the playlist URL (extractor/m3u8.go:10-62)
  P11 S3 listing      — ListBucketResult: Contents/Key file URLs,
                        CommonPrefixes drill-down, marker/continuation
                        pagination URLs (extractor/s3.go:44-124)
  P12 routing         — content_type -> parser branch
                        (capture.go:459-501)

All plain-Python helpers are unit-tested against golden fixtures
(tests/test_parse.py) modeled on the reference's table-driven extractor
tests; extract_from_content() is the Spark surface (mapInPandas).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urljoin
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# relaxed URL scan of body text (the xurls.Relaxed analogue, bounded to
# http(s) schemes since everything else is dropped by F5 anyway)
_URL_RE = re.compile(r"https?://[^\s\"'<>\\)\\(]+")
# script bodies carry \uXXXX-escaped URLs (assets.go:333-339 unquotes
# them), so the script-scan regex must admit backslashes
_SCRIPT_URL_RE = re.compile(r"https?://[^\s\"'<>)(]+")
_CSS_URL_RE = re.compile(r"url\(\s*['\"]?([^'\")\s]+)['\"]?\s*\)")

_ASSET_TAGS = {
    "img": ("src", "data-src", "data-lazy-src"),
    "video": ("src",),
    "audio": ("src",),
    "source": ("src",),
    "script": ("src",),
    "embed": ("src",),
    "track": ("src",),
}
_SRCSET_ATTRS = ("srcset", "data-srcset")


def _parse_srcset(value: str) -> list[str]:
    """srcset = comma-separated 'url [descriptor]' entries."""
    out = []
    for part in value.split(","):
        part = part.strip()
        if part:
            out.append(part.split()[0])
    return out


def _safe_urljoin(base: str, u: str) -> str | None:
    """urljoin that treats a parse failure as skip-the-candidate
    (queue/item.go:76-80 discipline, same contract as canonicalize):
    urllib raises ValueError on malformed IPv6-ish input — a single
    hostile ``<a href="http://[">`` (or a hostile <base>) would
    otherwise crash the whole extract task, and with it the crawl.
    A hostile BASE still lets an absolute candidate through; it gets
    its real parse at canonicalize time."""
    try:
        return urljoin(base, u)
    except ValueError:
        return u if u.startswith(("http://", "https://")) else None


def _unquote_url(u: str) -> str | None:
    """strconv.Unquote analogue (assets.go:333-339): resolve \\uXXXX
    escapes that appear in script-embedded URLs; None = skip (the
    reference skips unquotable matches)."""
    if "\\" not in u:
        return u
    try:
        return json.loads(f'"{u}"')
    except Exception:
        return None


def extract_script_assets(text: str, script_type: str = "") -> list[str]:
    """Inline <script> asset harvest (assets.go:302-381), three passes:

      1. type="application/json" bodies -> full JSON URL walk
      2. relaxed URL regex over the script content, http-prefixed
         matches kept, unicode-unquoted (outer-HTML regex scan analogue)
      3. variable-assignment JSON: bodies not starting '{' are split
         after the first '=', brace-balanced to the payload end, and
         JSON-walked (assets.go:343-381)
    """
    out: list[str] = []
    if script_type == "application/json":
        out.extend(extract_json(text))
    for m in _SCRIPT_URL_RE.findall(text):
        if m.startswith("http"):
            u = _unquote_url(m)
            if u is not None:
                out.append(u)
    if text and not text.startswith("{"):
        _, eq, rest = text.partition("=")
        if eq:
            opened = closed = 0
            end = 0
            for pos, ch in enumerate(rest):
                if ch == "{":
                    opened += 1
                elif ch == "}":
                    closed += 1
                else:
                    continue
                if opened and opened == closed:
                    end = pos
                    break
            if end:
                out.extend(extract_json(rest[: end + 1]))
    return out


class _Extractor(HTMLParser):
    def __init__(self, disabled_tags: frozenset[str] = frozenset()) -> None:
        super().__init__(convert_charrefs=True)
        self.outlinks: list[str] = []
        self.assets: list[str] = []
        self.base: str | None = None
        self.disabled = set(disabled_tags)  # --disable-html-tag (cmd/get.go:48)
        self._in_style = False
        self._script: list[str] | None = None
        self._script_type = ""
        self._text: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        disabled = tag in self.disabled
        if tag == "base" and not self.base and a.get("href"):
            self.base = a["href"]  # P3: first <base> wins
        elif tag == "a" and a.get("href"):
            self.outlinks.append(a["href"])
        elif tag == "iframe" and a.get("src"):
            self.outlinks.append(a["src"])
        elif tag == "ref" and a.get("target"):
            self.outlinks.append(a["target"])
        elif tag == "link" and a.get("href") and not disabled:
            if a.get("rel", "").lower() != "alternate":  # assets.go:402-417
                self.assets.append(a["href"])
        elif tag == "meta" and not disabled:
            for attr in ("href", "content"):
                v = a.get(attr)
                if v and v.startswith(("http://", "https://")):
                    self.assets.append(v)
        elif tag == "style" and not disabled:
            self._in_style = True
        elif tag == "script" and not disabled:
            self._script = []
            self._script_type = a.get("type", "")
        if tag in _ASSET_TAGS and not disabled:
            for attr in _ASSET_TAGS[tag]:
                if a.get(attr):
                    self.assets.append(a[attr])
            for attr in _SRCSET_ATTRS:
                if a.get(attr):
                    self.assets.extend(_parse_srcset(a[attr]))
        # [data-item] JSON payloads (assets.go:197-207)
        if a.get("data-item"):
            self.assets.extend(extract_json(a["data-item"]))
        # data-preview URLs (assets.go:225-231)
        if a.get("data-preview", "").startswith("http"):
            self.assets.append(a["data-preview"])
        # inline style="background: url(...)" (assets.go:210-223)
        if a.get("style"):
            self.assets.extend(_CSS_URL_RE.findall(a["style"]))

    def handle_endtag(self, tag):
        if tag == "style":
            self._in_style = False
        elif tag == "script" and self._script is not None:
            self.assets.extend(
                extract_script_assets("".join(self._script), self._script_type)
            )
            self._script = None
            self._script_type = ""

    def handle_data(self, data):
        if self._in_style:
            self.assets.extend(_CSS_URL_RE.findall(data))
        elif self._script is not None:
            self._script.append(data)
        else:
            self._text.append(data)


def extract_html(
    body: str, disabled_tags: frozenset[str] = frozenset()
) -> tuple[list[str], list[str], str | None]:
    """P1+P2+P3: (outlinks, assets, base_override).  ``disabled_tags``
    = the reference's --disable-html-tag column-pruning knob (asset tags
    only; outlink tags are never disabled, matching assets.go)."""
    p = _Extractor(disabled_tags)
    try:
        p.feed(body)
    except Exception:
        pass
    # regex URL scan of the visible text (utils.go:59-79)
    text = " ".join(p._text)
    p.outlinks.extend(_URL_RE.findall(text))
    return p.outlinks, p.assets, p.base


def parse_link_header(value: str) -> list[tuple[str, str]]:
    """P7: '<url>; rel=next, <url2>; rel=prev' -> [(url, rel)].
    Tolerant of missing rel (empty string), like link_header.go."""
    out: list[tuple[str, str]] = []
    for part in value.split(","):
        part = part.strip()
        if not part.startswith("<"):
            continue
        end = part.find(">")
        if end < 0:
            continue
        url = part[1:end]
        rel = ""
        for param in part[end + 1 :].split(";"):
            k, _, v = param.strip().partition("=")
            if k.strip().lower() == "rel":
                rel = v.strip().strip('"')
        out.append((url, rel))
    return out


_SITEMAP_MARKERS = ("sitemaps.org/schemas/sitemap", "<urlset", "<sitemapindex")


def extract_xml(body: str) -> tuple[list[str], bool]:
    """P8: all leaf text values starting 'http', plus is_sitemap (routes
    to outlinks when true, assets otherwise — capture.go:461-480)."""
    urls: list[str] = []
    is_sitemap = any(m in body[:4096] for m in _SITEMAP_MARKERS)
    try:
        root = ElementTree.fromstring(body)
    except ElementTree.ParseError:
        return _URL_RE.findall(body), is_sitemap
    for elem in root.iter():
        for value in (elem.text, elem.tail):
            if value:
                value = value.strip()
                if value.startswith("http"):
                    urls.append(value)
        for value in elem.attrib.values():
            if value.startswith("http"):
                urls.append(value)
    return urls, is_sitemap


def extract_json(body: str) -> list[str]:
    """P9: recursive walk collecting absolute http(s) URL strings."""
    try:
        doc = json.loads(body)
    except Exception:
        return []
    out: list[str] = []

    def _walk(node):
        if isinstance(node, dict):
            for v in node.values():
                _walk(v)
        elif isinstance(node, list):
            for v in node:
                _walk(v)
        elif isinstance(node, str) and node.startswith(("http://", "https://")):
            out.append(node)

    _walk(doc)
    return out


def extract_m3u8(body: str, playlist_url: str) -> list[str]:
    """P10: segment/variant URIs (non-comment lines) + URI= attributes,
    resolved against the playlist URL."""
    out: list[str] = []
    for line in body.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("#"):
            m = re.search(r'URI="([^"]+)"', line)
            if m:
                r = _safe_urljoin(playlist_url, m.group(1))
                if r is not None:
                    out.append(r)
            continue
        r = _safe_urljoin(playlist_url, line)
        if r is not None:
            out.append(r)
    return out


_S3_SERVERS = (
    "AmazonS3", "WasabiS3", "UploadServer", "Windows-Azure-Blob", "AliyunOSS"
)


def is_s3_listing(server_header: str | None) -> bool:
    return bool(server_header) and any(s in server_header for s in _S3_SERVERS)


def extract_s3(body: str, base_url: str) -> list[str]:
    """P11: ListBucketResult -> file URLs (Key), prefix drill-down
    URLs, and marker/continuation pagination URLs."""
    try:
        root = ElementTree.fromstring(body)
    except ElementTree.ParseError:
        return []
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.find("}") + 1]
    if not root.tag.endswith("ListBucketResult"):
        return []
    base = base_url.split("?")[0].rstrip("/")
    out: list[str] = []
    for key in root.iter(f"{ns}Key"):
        if key.text:
            out.append(f"{base}/{key.text}")
    # drill-down prefixes come from CommonPrefixes children ONLY — the
    # top-level request-echo <Prefix> element every ListBucketResult
    # carries must not become a self-referential drill URL
    for common in root.iter(f"{ns}CommonPrefixes"):
        for prefix in common.iter(f"{ns}Prefix"):
            if prefix.text and prefix.text.strip("/"):
                out.append(f"{base}/?prefix={prefix.text}")
    truncated = next(root.iter(f"{ns}IsTruncated"), None)
    if truncated is not None and (truncated.text or "").lower() == "true":
        token = next(root.iter(f"{ns}NextContinuationToken"), None)
        marker = next(root.iter(f"{ns}NextMarker"), None)
        if token is not None and token.text:
            out.append(f"{base}/?continuation-token={token.text}")
        elif marker is not None and marker.text:
            out.append(f"{base}/?marker={marker.text}")
    return out


# ---------------------------------------------------------------------------
# the Spark surface: P12 routing over (url, content_type, body) batches
# ---------------------------------------------------------------------------

EXTRACTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("outlinks", T.ArrayType(T.StringType()), False),
        T.StructField("assets", T.ArrayType(T.StringType()), False),
    ]
)


def route_extract(url: str, content_type: str, body: str,
                  link_header: str | None = None,
                  server_header: str | None = None,
                  disabled_tags: frozenset[str] = frozenset(),
                  ) -> tuple[list[str], list[str]]:
    """P12 content-type routing -> (outlinks, assets); relative URLs are
    resolved against the document (or its <base>).  Site-specific
    extractor branches (§2.7) run before generic routing, mirroring
    capture.go:396-416's post-response dispatch."""
    from zeno_spark.operators import sitespecific as ss

    ct = (content_type or "").split(";")[0].strip().lower()
    outlinks: list[str] = []
    assets: list[str] = []
    if link_header:
        # RFC 8288 allows relative targets; resolve against the request
        # URL on EVERY return path (the html branch returns early)
        outlinks.extend(
            r for u, _rel in parse_link_header(link_header)
            if (r := _safe_urljoin(url, u)) is not None
        )
    if ss.is_reddit_post_api(url):
        # reddit post-API JSON: permalinks -> outlinks, payload URL walk
        # -> assets (sitespecific/reddit/post.go:188-220)
        perms, raw = ss.extract_reddit_post(body)
        outlinks.extend(perms)
        assets.extend(raw)
    elif ss.is_ina_api(url):
        # ina partner-API JSON -> media URLs (ina.go:178-195)
        assets.extend(ss.extract_ina_medias(body))
    elif is_s3_listing(server_header):
        outlinks.extend(extract_s3(body, url))
    elif ct.endswith("xml") or body[:256].lstrip().startswith("<?xml"):
        urls, sitemap = extract_xml(body)
        (outlinks if sitemap else assets).extend(urls)
    elif ct == "application/json":
        assets.extend(extract_json(body))
    elif ct in ("application/x-mpegurl", "application/vnd.apple.mpegurl"):
        assets.extend(extract_m3u8(body, url))
    elif ct.startswith("text/"):
        o, a, base = extract_html(body, disabled_tags)
        if ss.is_ina(url):
            # ina player divs carry config/details/poster URLs
            # (ina.go:84-100); the live JWPlayer discovery is stubbed
            a = list(a) + ss.extract_ina_player_attrs(body)
        doc_base = base or url
        outlinks.extend(r for u in o if (r := _safe_urljoin(doc_base, u)) is not None)
        assets.extend(r for u in a if (r := _safe_urljoin(doc_base, u)) is not None)
        return outlinks, assets
    return (
        [r for u in outlinks if (r := _safe_urljoin(url, u)) is not None],
        [r for u in assets if (r := _safe_urljoin(url, u)) is not None],
    )


def extract_from_content(
    fetched: DataFrame, disabled_tags: frozenset[str] = frozenset()
) -> DataFrame:
    """Batch extraction over (url, content_type, bytes) — the content-
    mode analogue of operators/extract.py's links-table join.  One
    mapInPandas pass; explode downstream.  ``disabled_tags`` prunes
    asset tag classes before the explode (--disable-html-tag)."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, ct, body in zip(pdf["url"], pdf["content_type"], pdf["bytes"]):
                text = bytes(body).decode("utf-8", "replace") if body is not None else ""
                o, a = route_extract(url, ct, text, disabled_tags=disabled_tags)
                rows.append({"url": url, "outlinks": o, "assets": a})
            yield pd.DataFrame(rows, columns=["url", "outlinks", "assets"])

    return fetched.select("url", "content_type", "bytes").mapInPandas(
        _batch, schema=EXTRACTED
    )
