"""Single-threaded Python oracle of the crawl semantics (SURVEY §5 item 2).

Implements the SAME round-based (BSP) semantics as plans/crawl.py over
plain dicts/lists — ~200 lines, no Spark — so golden tests can assert
that the distributed pipeline's crawl ordering, URL-seen set and fetched
set match an independently-written sequential implementation.

Semantics it encodes (and where they come from in /root/reference):
  * admission F1-F5 (crawl/exclusion.go:10-58, utils/url.go:105-127)
  * per-host FIFO with per-round budget (queue/dequeue.go:135-158 +
    index/index.go:49-90, batched: k round-robin turns per round)
  * seencheck at discovery time (outlinks.go:59-63, crawl.go:217-235)
  * hop gate F6 (outlinks.go:77), asset hop=parent (assets.go:109),
    self-ref guard F9 (assets.go:84-87), domains-crawl F8
    (outlinks.go:100-164)
  * redirect continuation with redirect+1, F7 bound (capture.go:120-178)
    — BSP divergence from the reference: followed next round, not
    inline; the final seen/fetched sets are unaffected
  * 429 retry with linear backoff + bypass-seencheck sendback
    (capture.go:56-117,319-330); deterministic recovery on retry>=1
    (the sandbox "server")
  * deterministic enqueue_seq: seeds = line order; discovered =
    ((round+1) << 40) | (fnv1a64(url) mod 2^40) — shared formula with
    operators/extract.py

URL canonicalization and hashing are imported from functions/urls.py so
oracle and pipeline share one implementation of the *string* semantics;
everything the oracle is meant to check (scheduling, dedup, routing,
lifecycle) is implemented independently here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from zeno_spark.config import CrawlConfig
from zeno_spark.functions.urls import (
    canonicalize,
    domains_crawl_pass,
    fnv1a64,
    resolve,
    url_host,
)

_SEQ_SHIFT = 40
_SEQ_MASK = (1 << _SEQ_SHIFT) - 1


@dataclass
class Item:
    url: str
    host: str
    parent_url: str | None
    hop: int
    type: str
    redirect: int
    retry: int
    enqueue_seq: int
    not_before_round: int


@dataclass
class OracleResult:
    # round -> host -> FIFO-ordered list of scheduled urls
    schedule: list[dict[str, list[str]]] = field(default_factory=list)
    fetched: list[tuple[int, str, str, int]] = field(default_factory=list)  # (round, url, type, hop)
    seen: set[str] = field(default_factory=set)
    revisits: set[tuple[int, str]] = field(default_factory=set)  # D8: (round, url)
    rounds: int = 0


def _payload_len_fn():
    """Payload length by (image_id, fmt) — same deterministic codec the
    corpus generator uses (fixtures.attach_payloads), memoized."""
    from zeno_spark.functions.images import encode_image, generate_pixels

    cache: dict[tuple[str, str], int] = {}

    def plen(image_id: str, fmt: str, w: int, h: int) -> int:
        key = (image_id, fmt)
        if key not in cache:
            px = generate_pixels(fnv1a64(image_id) & 0xFFFFFFFF, int(w), int(h))
            cache[key] = len(encode_image(px, fmt))
        return cache[key]

    return plen


def _admitted(url: str, host: str, cfg: CrawlConfig) -> bool:
    if not (url.startswith("http://") or url.startswith("https://")):
        return False
    if host in cfg.excluded_hosts:
        return False
    if cfg.included_hosts and host not in cfg.included_hosts:
        return False
    for s in cfg.exclude_strings:
        if s in url:
            return False
    if cfg.include_strings and not any(s in url for s in cfg.include_strings):
        return False
    return True


def crawl_oracle(
    pages: pd.DataFrame,
    links: pd.DataFrame,
    seed_urls: list[str],
    cfg: CrawlConfig,
    max_rounds: int = 64,
) -> OracleResult:
    page_by_url = {r.url: r for r in pages.itertuples(index=False)}
    links_by_src: dict[str, list] = {}
    for r in links.itertuples(index=False):
        links_by_src.setdefault(r.src_url, []).append(r)

    res = OracleResult()
    pending: list[Item] = []
    payload_len = _payload_len_fn()
    digests_seen: set[tuple[str, str]] = set()  # (image_id, fmt) ⇔ payload bytes

    # ---- seeding (S1 + D2) ----
    for line, raw in enumerate(seed_urls):
        curl = canonicalize(raw)
        if curl is None:
            continue
        host = url_host(curl)
        if not host or not _admitted(curl, host, cfg):
            continue
        if curl in res.seen:
            continue
        res.seen.add(curl)
        pending.append(Item(curl, host, None, 0, "seed", 0, 0, line, 0))

    for round_no in range(max_rounds):
        if not pending:
            break
        eligible = [it for it in pending if it.not_before_round <= round_no]
        # politeness: per-host FIFO top-budget
        by_host: dict[str, list[Item]] = {}
        for it in eligible:
            if _admitted(it.url, it.host, cfg):
                by_host.setdefault(it.host, []).append(it)
        scheduled: list[Item] = []
        round_sched: dict[str, list[str]] = {}
        for host in sorted(by_host):
            q = sorted(
                by_host[host], key=lambda it: (it.enqueue_seq, fnv1a64(it.url))
            )[: cfg.per_host_budget]
            scheduled.extend(q)
            round_sched[host] = [it.url for it in q]
        res.schedule.append(round_sched)

        sched_ids = {id(it) for it in scheduled}
        candidates: list[Item] = []
        retries: list[Item] = []
        payload_fetches: list[Item] = []  # D8 pass after the loop

        for it in scheduled:
            page = page_by_url.get(it.url)
            status = int(page.status) if page is not None else 404
            if status == 429 and it.retry >= 1:
                status = 200  # deterministic recovery (sandbox server)
            if status == 200:
                res.fetched.append((round_no, it.url, it.type, it.hop))
                if (
                    cfg.payload_dedupe
                    and page is not None
                    and page.image_id is not None
                ):
                    payload_fetches.append(it)
                if page is not None and page.content_type == "text/html":
                    for edge in links_by_src.get(it.url, []):
                        absu = resolve(it.url, edge.dst_url)
                        curl = canonicalize(absu)
                        if curl is None:
                            continue
                        host = url_host(curl)
                        if not host or not _admitted(curl, host, cfg):
                            continue
                        if edge.kind == "asset":
                            if curl == it.url:  # F9
                                continue
                            hop, typ = it.hop, "asset"
                        else:
                            if cfg.domains_crawl and domains_crawl_pass(
                                it.host, host, it.hop
                            ):
                                hop, typ = 0, "seed"
                            elif cfg.max_hops >= it.hop + 1:  # F6
                                hop, typ = it.hop + 1, "seed"
                            else:
                                continue
                        seq = ((round_no + 1) << _SEQ_SHIFT) | (
                            (fnv1a64(curl) % (1 << 64)) & _SEQ_MASK
                        )
                        candidates.append(
                            Item(curl, host, it.url, hop, typ, 0, 0, seq, round_no + 1)
                        )
            elif 300 <= status < 400 and page is not None and page.redirect_to:
                if it.redirect < cfg.max_redirect:
                    curl = canonicalize(resolve(it.url, page.redirect_to))
                    if curl and curl != it.url:
                        host = url_host(curl)
                        if host and _admitted(curl, host, cfg):
                            seq = ((round_no + 1) << _SEQ_SHIFT) | (
                                (fnv1a64(curl) % (1 << 64)) & _SEQ_MASK
                            )
                            candidates.append(
                                Item(curl, host, it.url, it.hop, it.type,
                                     it.redirect + 1, 0, seq, round_no + 1)
                            )
            elif status == 429:
                if it.retry + 1 <= cfg.max_retry:
                    retries.append(
                        Item(it.url, it.host, it.parent_url, it.hop, it.type,
                             it.redirect, it.retry + 1, it.enqueue_seq,
                             round_no + 1 + (it.retry + 1) * cfg.retry_backoff_rounds)
                    )
            # other statuses: dead

        # D8 payload dedupe: within the round, first-wins by the same
        # (enqueue_seq, url_hash, url) order the Spark window uses
        # (fetch.mark_payload_revisits); across rounds, digests_seen is
        # the fetched table's digest column.  (image_id, fmt) is payload-
        # byte identity under the deterministic generator.
        for it in sorted(
            payload_fetches, key=lambda x: (x.enqueue_seq, fnv1a64(x.url), x.url)
        ):
            page = page_by_url[it.url]
            if payload_len(page.image_id, page.fmt, page.w, page.h) < \
                    cfg.payload_dedupe_min_size:
                continue
            key = (page.image_id, page.fmt)
            if key in digests_seen:
                res.revisits.add((round_no, it.url))
            else:
                digests_seen.add(key)

        # in-batch dedupe: keep min (seq, hop, type, parent) per url — the
        # same deterministic tiebreak as operators/dedup.in_batch_dedupe
        best: dict[str, Item] = {}
        for c in candidates:
            k = c.url
            prev = best.get(k)
            ck = (c.enqueue_seq, c.hop, c.type, c.parent_url or "")
            if prev is None or ck < (prev.enqueue_seq, prev.hop, prev.type, prev.parent_url or ""):
                best[k] = c
        new_items = []
        for c in best.values():
            if c.url in res.seen:  # D1/D3/D4/D5 (seen at discovery)
                continue
            res.seen.add(c.url)
            new_items.append(c)

        pending = [it for it in pending if id(it) not in sched_ids]
        pending.extend(new_items)
        pending.extend(retries)
        res.rounds = round_no + 1

    return res
