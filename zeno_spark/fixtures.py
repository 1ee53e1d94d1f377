"""Deterministic synthetic web corpus (FIXTURES.md; seed=42 everywhere).

Pure function of (seed, n_pages, n_hosts): page metadata + link graph are
generated driver-side with numpy (cheap — a few MB even at bench scale);
the image payloads (the heavy part) are attached DISTRIBUTED via
mapInPandas, with each row's pixel seed derived from its image_id so the
bytes are independent of partitioning.

Corpus shape mirrors what the reference crawls:
  * zipf host skew (hot-host politeness/salting is the point)
  * html pages carry links (outlinks + assets: outlinks.go:13-51,
    assets.go:182-457); image leaves carry the image+caption payload
    (BASELINE.json input_hint)
  * seeded minority of 301 (redirect_to), 404, 429 statuses
    (capture.go:84-178)
  * relative / fragment-carrying dst_urls (utils/url.go:78-94)
  * duplicate dst_urls (dedup, utils/url.go:97-112), self-links
    (assets.go:84-87), cross-subdomain same-domain edges (domains-crawl
    pass, outlinks.go:100-164)
  * seeds include duplicates and one invalid URL (queue/item.go:76-80)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from zeno_spark import schemas
from zeno_spark.functions.images import (
    encode_image,
    generate_pixels,
    phash64,
)
from zeno_spark.functions.urls import fnv1a64

# deterministic caption vocabulary
_VOCAB = [
    "amber", "basalt", "cedar", "delta", "ember", "fjord", "garnet", "harbor",
    "indigo", "juniper", "krill", "lumen", "maple", "nectar", "onyx", "prism",
    "quartz", "raven", "sepia", "tundra", "umber", "vellum", "willow", "xenon",
    "yarrow", "zephyr",
]


def caption_for(image_id: str) -> str:
    """Deterministic caption: tokens picked by the FNV hash of image_id
    (byte-equality is the test invariant, input_hint)."""
    h = fnv1a64(image_id) & 0xFFFFFFFFFFFFFFFF
    n = 4 + (h % 5)
    words = []
    for _ in range(int(n)):
        words.append(_VOCAB[h % len(_VOCAB)])
        h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    return " ".join(words)


def dims_for(image_id: str, lo: int = 16, hi: int = 64) -> tuple[int, int]:
    """Deterministic dims in [lo, hi] px.  Tests use the default
    thumbnail range; the bench corpus uses production-like sizes
    (bench.py) so the decode/verify compute per page is realistic."""
    h = fnv1a64(image_id) & 0xFFFFFFFFFFFFFFFF
    span = hi - lo + 1
    return lo + int(h % span), lo + int((h >> 8) % span)


def _host_names(n_hosts: int) -> list[str]:
    """~1/3 of hosts are subdomain triples of shared registrable domains
    (exercises F8); the rest are singletons."""
    hosts: list[str] = []
    k = 0
    while len(hosts) < n_hosts:
        if k % 3 == 0 and n_hosts - len(hosts) >= 3:
            for sub in ("www", "img", "cdn"):
                hosts.append(f"{sub}.site{k}.com")
        else:
            hosts.append(f"h{k}.example{k % 7}.net")
        k += 1
    return hosts[:n_hosts]


def build_metadata(
    n_pages: int = 200, n_hosts: int = 10, seed: int = 42,
    img_dims: tuple[int, int] = (16, 64),
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """(pages_meta, links, seeds) as pandas frames — no payload bytes yet."""
    rng = np.random.default_rng(seed)
    hosts = np.array(_host_names(n_hosts))

    # zipf-distributed host popularity (hot-host skew)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    page_host_idx = rng.choice(n_hosts, size=n_pages, p=probs)

    is_image = rng.random(n_pages) < 0.3
    fmt = np.where(rng.random(n_pages) < 0.5, "png", "jpeg")
    idx = np.arange(n_pages)
    page_host = hosts[page_host_idx]
    urls = np.where(
        is_image,
        np.char.add(
            np.char.add(np.char.add("http://", page_host), "/img/"),
            np.char.add(idx.astype(str), np.char.add(".", fmt)),
        ),
        np.char.add(np.char.add(np.char.add("http://", page_host), "/p/"), idx.astype(str)),
    )

    # statuses: 90% 200, 4% 301, 3% 404, 3% 429 (html pages only get 3xx)
    roll = rng.random(n_pages)
    status = np.full(n_pages, 200, dtype=np.int32)
    status[(roll >= 0.90) & (roll < 0.94) & ~is_image] = 301
    status[(roll >= 0.94) & (roll < 0.97)] = 404
    status[roll >= 0.97] = 429

    html_idx = idx[~is_image]
    image_idx = idx[is_image]

    # redirect targets: another html page on the same host if one exists
    redirect_to = np.full(n_pages, None, dtype=object)
    for i in idx[status == 301]:
        same = html_idx[(page_host_idx[html_idx] == page_host_idx[i]) & (html_idx != i)]
        pool = same if len(same) else html_idx[html_idx != i]
        if len(pool):
            redirect_to[i] = urls[rng.choice(pool)]
        else:
            status[i] = 200

    pages = pd.DataFrame(
        {
            "url": urls,
            "host": page_host,
            "image_id": np.where(is_image, np.char.add("img-", idx.astype(str)), None),
            "w": 0,
            "h": 0,
            "fmt": np.where(is_image, fmt, None),
            "caption": None,
            "content_type": np.where(
                is_image, np.char.add("image/", fmt), "text/html"
            ),
            "status": status,
            "redirect_to": redirect_to,
        }
    )
    img_ids = pages.loc[is_image, "image_id"]
    dims = img_ids.map(lambda i: dims_for(i, *img_dims))
    pages.loc[is_image, "w"] = dims.map(lambda t: t[0]).astype(np.int32)
    pages.loc[is_image, "h"] = dims.map(lambda t: t[1]).astype(np.int32)
    pages.loc[is_image, "caption"] = img_ids.map(caption_for)

    # payload-duplicate tier (D8, crawl/crawl.go:96-99): ~12% of image
    # pages serve a byte-identical payload of another image page
    # (image_id + fmt + dims + caption aliased -> identical encode), so
    # the sink's revisit path has real work.  Separate rng stream keeps
    # every other draw sequence (hosts, statuses, links) unchanged.
    rng_dup = np.random.default_rng(seed + 7919)
    img_pos = np.flatnonzero(is_image)
    if len(img_pos) >= 4:
        dup_mask = rng_dup.random(len(img_pos)) < 0.12
        dup_rows, canon_rows = img_pos[dup_mask], img_pos[~dup_mask]
        if len(dup_rows) and len(canon_rows):
            src = canon_rows[
                (rng_dup.random(len(dup_rows)) * len(canon_rows)).astype(np.int64)
            ]
            for col in ("image_id", "fmt", "w", "h", "caption"):
                pages.loc[dup_rows, col] = pages[col].to_numpy()[src]
            pages.loc[dup_rows, "content_type"] = (
                "image/" + pages["fmt"].to_numpy()[src]
            )

    # ---- link graph (only 200-status html pages have bodies to parse) ----
    src_rows = html_idx[status[html_idx] == 200]
    if n_pages >= 5000:
        # bench scale: vectorized generator (same distribution family;
        # the small-scale loop below is kept verbatim so golden tests
        # stay stable)
        links = _links_vectorized(
            rng, urls, page_host_idx, html_idx, image_idx, src_rows, n_hosts
        )
        seeds = _seeds_frame(urls, src_rows, page_host_idx, n_hosts)
        return pages, links, seeds
    links_src, links_dst, links_kind, links_tag = [], [], [], []

    def _add(src_i: int, dst_i: int, kind: str, tag: str, style: float) -> None:
        src_u = urls[src_i]
        dst_u = urls[dst_i]
        same_host = page_host_idx[src_i] == page_host_idx[dst_i]
        if style < 0.2 and same_host:
            # relative form (exercises MakeAbsolute)
            dst_u = "/" + dst_u.split("/", 3)[3]
        elif style < 0.3:
            dst_u = dst_u + "#frag" + str(dst_i % 7)  # fragment strip
        links_src.append(src_u)
        links_dst.append(dst_u)
        links_kind.append(kind)
        links_tag.append(tag)

    for s in src_rows:
        sh = page_host_idx[s]
        # outlinks -> html pages, 60% same host, some same-registrable-domain
        n_out = rng.poisson(4)
        for _ in range(n_out):
            if rng.random() < 0.6:
                pool = html_idx[page_host_idx[html_idx] == sh]
            else:
                pool = html_idx
            if len(pool) == 0:
                continue
            d = int(rng.choice(pool))
            _add(s, d, "outlink", "a", rng.random())
        # assets -> image pages, 80% same host
        n_asset = rng.poisson(2)
        for _ in range(n_asset):
            if rng.random() < 0.8:
                pool = image_idx[page_host_idx[image_idx] == sh]
            else:
                pool = image_idx
            if len(pool) == 0:
                continue
            d = int(rng.choice(pool))
            _add(s, d, "asset", "img", rng.random())
        # occasional duplicate of the last edge + self-link
        if links_dst and rng.random() < 0.15:
            links_src.append(urls[s])
            links_dst.append(links_dst[-1])
            links_kind.append(links_kind[-1])
            links_tag.append(links_tag[-1])
        if rng.random() < 0.05:
            _add(s, s, "asset", "img", 0.9)  # self-reference (guard F9)

    links = pd.DataFrame(
        {"src_url": links_src, "dst_url": links_dst, "kind": links_kind, "tag": links_tag}
    )

    # ---- seeds: html pages on distinct hosts + a duplicate + one invalid ----
    seed_pool = src_rows
    chosen: list[int] = []
    seen_hosts: set[int] = set()
    for i in seed_pool:
        if page_host_idx[i] not in seen_hosts:
            chosen.append(int(i))
            seen_hosts.add(page_host_idx[i])
        if len(chosen) >= max(3, n_hosts // 2):
            break
    seed_urls = [urls[i] for i in chosen]
    if seed_urls:
        seed_urls.append(seed_urls[0])  # duplicate (dedup at seeding, crawl.go:217-235)
    seed_urls.append("::not a url::")  # skip-on-parse-error (item.go:76-80)
    seeds = pd.DataFrame({"url": seed_urls, "line": range(len(seed_urls))})

    return pages, links, seeds


def _seeds_frame(
    urls: np.ndarray, src_rows: np.ndarray, page_host_idx: np.ndarray, n_hosts: int
) -> pd.DataFrame:
    """First 200-status html page per host, up to max(3, n_hosts//2)
    hosts, plus a duplicate and one invalid URL (same shape as the
    small-scale loop)."""
    first_per_host = (
        pd.DataFrame({"i": src_rows, "h": page_host_idx[src_rows]})
        .drop_duplicates("h")
        .head(max(3, n_hosts // 2))
    )
    seed_urls = [urls[i] for i in first_per_host["i"]]
    if seed_urls:
        seed_urls.append(seed_urls[0])
    seed_urls.append("::not a url::")
    return pd.DataFrame({"url": seed_urls, "line": range(len(seed_urls))})


def _links_vectorized(
    rng: np.random.Generator,
    urls: np.ndarray,
    page_host_idx: np.ndarray,
    html_idx: np.ndarray,
    image_idx: np.ndarray,
    src_rows: np.ndarray,
    n_hosts: int,
) -> pd.DataFrame:
    """Vectorized link-graph generator for bench-scale corpora: poisson
    out-degrees, same-host bias via per-host index buckets, relative /
    fragment URL styles, self-links — all numpy, no per-edge Python."""
    paths = pd.Series(urls).str.replace(r"^https?://[^/]*", "", regex=True).to_numpy()

    def _bucketize(idx: np.ndarray):
        order = np.argsort(page_host_idx[idx], kind="stable")
        sorted_idx = idx[order]
        counts = np.bincount(page_host_idx[idx], minlength=n_hosts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        return sorted_idx, starts, counts

    html_sorted, html_start, html_cnt = _bucketize(html_idx)
    img_sorted, img_start, img_cnt = _bucketize(image_idx)

    def _edges(pool_sorted, pool_start, pool_cnt, pool_all, mean_deg, same_p, kind, tag):
        deg = rng.poisson(mean_deg, size=len(src_rows))
        src = np.repeat(src_rows, deg)
        if len(src) == 0:
            return None
        sh = page_host_idx[src]
        same = (rng.random(len(src)) < same_p) & (pool_cnt[sh] > 0)
        pick = np.empty(len(src), dtype=np.int64)
        r = rng.random(len(src))
        pick[same] = pool_sorted[
            pool_start[sh[same]] + (r[same] * pool_cnt[sh[same]]).astype(np.int64)
        ]
        pick[~same] = pool_all[(r[~same] * len(pool_all)).astype(np.int64)]
        style = rng.random(len(src))
        dst_u = urls[pick].astype(object)
        rel = (style < 0.2) & (page_host_idx[pick] == sh)
        dst_u[rel] = paths[pick[rel]]
        frag = (~rel) & (style < 0.3)
        dst_u[frag] = np.char.add(
            urls[pick[frag]], np.char.add("#frag", (pick[frag] % 7).astype(str))
        ).astype(object)
        return pd.DataFrame(
            {"src_url": urls[src], "dst_url": dst_u, "kind": kind, "tag": tag}
        )

    frames = [
        _edges(html_sorted, html_start, html_cnt, html_idx, 4, 0.6, "outlink", "a"),
        _edges(img_sorted, img_start, img_cnt, image_idx, 2, 0.8, "asset", "img"),
    ]
    # self-references (guard F9), ~5% of sources
    self_mask = rng.random(len(src_rows)) < 0.05
    if self_mask.any():
        s = src_rows[self_mask]
        frames.append(
            pd.DataFrame(
                {"src_url": urls[s], "dst_url": urls[s], "kind": "asset", "tag": "img"}
            )
        )
    frames = [f for f in frames if f is not None]
    out = pd.concat(frames, ignore_index=True)
    # in-batch duplicate edges (~10%), exercising D6
    dup = out.sample(frac=0.1, random_state=42)
    return pd.concat([out, dup], ignore_index=True)


def attach_payloads(spark: SparkSession, pages_meta: pd.DataFrame) -> DataFrame:
    """Distributed payload attach: encode image bytes + phash inside
    mapInPandas (each row seeded by fnv(image_id) — partition-independent)."""
    meta_df = spark.createDataFrame(pages_meta)

    def _gen(batches):
        for pdf in batches:
            out_bytes: list[bytes | None] = []
            out_phash: list[int | None] = []
            for image_id, w, h, fmt in zip(pdf["image_id"], pdf["w"], pdf["h"], pdf["fmt"]):
                if image_id is None or fmt is None:
                    out_bytes.append(None)
                    out_phash.append(None)
                    continue
                px = generate_pixels(fnv1a64(image_id) & 0xFFFFFFFF, int(w), int(h))
                out_bytes.append(encode_image(px, fmt))
                out_phash.append(phash64(px))
            pdf = pdf.assign(bytes=pd.Series(out_bytes, index=pdf.index, dtype=object),
                             phash=pd.Series(out_phash, index=pdf.index, dtype=object))
            yield pdf[[f.name for f in schemas.PAGES.fields]]

    n_part = max(spark.sparkContext.defaultParallelism, 4)
    return meta_df.repartition(n_part).mapInPandas(_gen, schema=schemas.PAGES)


def build_corpus(
    spark: SparkSession,
    n_pages: int = 200,
    n_hosts: int = 10,
    seed: int = 42,
    img_dims: tuple[int, int] = (16, 64),
) -> dict[str, DataFrame]:
    """pages / links / seeds / robots DataFrames (robots = allow-all;
    the robots gate is a north-rule addition, SURVEY §2.2 F10)."""
    pages_meta, links, seeds = build_metadata(n_pages, n_hosts, seed, img_dims)
    pages = attach_payloads(spark, pages_meta)
    robots_rows = [(h, [], None, [])
                   for h in sorted(pages_meta["host"].unique())]
    return {
        "pages": pages,
        "links": spark.createDataFrame(links, schema=schemas.LINKS),
        "seeds": spark.createDataFrame(seeds, schema="url string, line long"),
        "robots": spark.createDataFrame(robots_rows, schema=schemas.ROBOTS),
    }


def write_corpus(spark: SparkSession, out_dir: str, n_pages: int, n_hosts: int, seed: int = 42) -> None:
    corpus = build_corpus(spark, n_pages, n_hosts, seed)
    for name, df in corpus.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
