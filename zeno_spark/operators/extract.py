"""Parse/extract/expand stage, P1-P13 + F6/F8/F9 routing (SURVEY §2.6).

In the reference, a fetched HTML body goes through the tag extractors
(outlinks.go:13-51, assets.go:182-457), then every URL list is
normalized: resolve relative -> strip fragment -> canonicalize -> dedupe
(utils/url.go:78-112).  In this sandbox the extractors' *output* is the
synthetic ``links`` table (one row per (page, discovered URL), with
relative and fragment-carrying forms preserved), so extraction is an
equi-join on the source page URL; the normalize pipeline is real and
vectorized (pandas UDFs from functions/urls.py).

Routing semantics reproduced exactly:
  * asset   -> type='asset', hop = parent.hop (assets.go:109); never
               hop-gated; self-reference guard F9 (assets.go:84-87)
  * outlink -> type='seed'; hop = 0 when the domains-crawl pass applies
               (outlinks.go:100-164, F8) else parent.hop+1, gated by
               MaxHops (outlinks.go:77, F6)

enqueue_seq (the FIFO key) for discovered rows is the deterministic
composite  (discovered_round << 40) | (fnv1a64(url) mod 2^40)  — a total
order that needs NO global row_number (scale: no single-task window).
The reference's true order is its file-append order, which depends on
goroutine timing; SURVEY §7 declares deterministic-seq + oracle-matched
tie-breaks the reproduction strategy, and the Python oracle
(zeno_spark/oracle.py) implements this exact formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zeno_spark.config import CrawlConfig
from zeno_spark.functions import urls as U
from zeno_spark.operators.admission import (
    admission_predicate,
    hop_gate,
    self_reference_guard,
)

_SEQ_SHIFT = 40
_SEQ_MASK = (1 << _SEQ_SHIFT) - 1


def discovered_seq(round_col, url_hash_col):
    """Deterministic enqueue_seq for URLs discovered in `round`."""
    return (round_col.cast("long") * F.lit(1 << _SEQ_SHIFT)) + F.pmod(
        url_hash_col, F.lit(_SEQ_MASK + 1)
    )


def extract_candidates(
    ok_html: DataFrame, links: DataFrame, cfg: CrawlConfig, round_no: int
) -> DataFrame:
    """Fetched-200 html rows -> candidate frontier rows (pre-dedup),
    extraction = the synthetic links-table join.

    ok_html needs columns: url, hop, host, enqueue_seq.
    Returns FRONTIER-shaped rows, in-batch duplicates NOT yet dropped.
    """
    parents = ok_html.select(
        F.col("url").alias("parent_url"),
        F.col("hop").alias("parent_hop"),
        F.col("host").alias("parent_host"),
    )
    # P1/P2 analogue: the extractor output join.  links is pre-shuffled on
    # src_url by the parquet layout; Catalyst prunes to 4 columns.
    edges = parents.join(
        links, parents["parent_url"] == links["src_url"], "inner"
    ).drop("src_url")
    return edge_candidates(edges, cfg, round_no)


def content_candidates(
    ok: DataFrame, cfg: CrawlConfig, round_no: int
) -> DataFrame:
    """Fetched-200 rows carrying in-worker extraction arrays (a live
    transport with extract=True, operators/transport.py) -> candidate
    frontier rows.  Same edge pipeline as extract_candidates — only the
    edge SOURCE differs (explode of the per-page arrays vs the links
    join), so the two paths produce identical frontiers on the same
    discovered URL sets (tested in tests/test_transport.py)."""
    edge = F.explode(
        F.concat(
            F.transform(
                F.coalesce(F.col("outlinks"), F.array()),
                lambda u: F.struct(
                    u.alias("dst_url"), F.lit("outlink").alias("kind")
                ),
            ),
            F.transform(
                F.coalesce(F.col("assets"), F.array()),
                lambda u: F.struct(
                    u.alias("dst_url"), F.lit("asset").alias("kind")
                ),
            ),
        )
    )
    edges = ok.select(
        F.col("url").alias("parent_url"),
        F.col("hop").alias("parent_hop"),
        F.col("host").alias("parent_host"),
        edge.alias("__e2"),
    ).select(
        "parent_url", "parent_hop", "parent_host",
        F.col("__e2.dst_url").alias("dst_url"),
        F.col("__e2.kind").alias("kind"),
    )
    return edge_candidates(edges, cfg, round_no)


def edge_candidates(
    edges: DataFrame, cfg: CrawlConfig, round_no: int
) -> DataFrame:
    """(parent_url, parent_hop, parent_host, dst_url, kind) edges ->
    gated FRONTIER-shaped candidate rows (shared tail of both
    extraction modes)."""
    # statically-doomed edges never pay the Arrow roundtrip: with
    # domains_crawl off, an outlink at parent_hop == max_hops fails F6
    # whatever the UDF computes (hop_next = parent_hop + 1 > max_hops;
    # assets keep parent hop, and domains_crawl can re-enter at hop 0,
    # so both are exempt).  In the fringe rounds of a depth-limited
    # crawl these are the MAJORITY of edges, and the enrich UDF is the
    # dominant extract cost — identical output, fraction of the work.
    if not cfg.domains_crawl:
        edges = edges.filter(
            (F.col("kind") == "asset")
            | (F.col("parent_hop") + 1 <= F.lit(cfg.max_hops))
        )
    # P3-P6: resolve relative vs parent, strip fragment, canonicalize,
    # hash, host — ONE fused Arrow roundtrip (enrich_url_udf); chaining
    # separate pandas UDFs would serialize the batch once per step.
    resolved = (
        edges.withColumn(
            "__e", U.enrich_url_udf(F.col("parent_url"), F.col("dst_url"))
        )
        .withColumn("url", F.col("__e.url"))
        .withColumn("url_hash", F.col("__e.url_hash"))
        .withColumn("host", F.col("__e.host"))
        .drop("__e")
        .filter(F.col("url").isNotNull())  # skip-on-parse-error
    )

    # F8: domains-crawl pass (hop 0 re-entry) — native comparison of
    # last-two-label domains (reg_domain_col stays in codegen); the 25
    # hosting providers need the substring rule.
    if cfg.domains_crawl:
        odom = U.reg_domain_col(F.col("parent_host"))
        ldom = U.reg_domain_col(F.col("host"))
        in_providers = odom.isin(*sorted(U._SUBDOMAIN_ONLY))
        pass_ok = (F.col("parent_hop") == 0) & (odom != "") & (ldom != "") & (
            F.when(in_providers, F.col("host").contains(F.col("parent_host")))
            .otherwise(odom == ldom)
        )
    else:
        pass_ok = F.lit(False)

    is_asset = F.col("kind") == "asset"
    hop_next = (
        F.when(is_asset, F.col("parent_hop"))  # assets keep parent hop (assets.go:109)
        .when(pass_ok, F.lit(0))               # F8 hop-0 re-entry
        .otherwise(F.col("parent_hop") + 1)
    )

    cand = resolved.select(
        F.sha1(F.concat_ws("|", F.lit(round_no), F.col("url"))).alias("id"),
        "url",
        "url_hash",
        "host",
        "parent_url",
        hop_next.cast("int").alias("hop"),
        F.when(is_asset, F.lit("asset")).otherwise(F.lit("seed")).alias("type"),
        F.lit(False).alias("bypass_seencheck"),
        F.lit(0).alias("redirect"),
        F.lit(0).alias("retry"),
        discovered_seq(F.lit(round_no + 1), F.col("url_hash")).alias("enqueue_seq"),
        F.lit(round_no + 1).cast("int").alias("discovered_round"),
        F.lit(round_no + 1).cast("int").alias("not_before_round"),
        F.lit(0).alias("priority"),
        is_asset.alias("__is_asset"),
    )

    # gates: F6 for outlinks only (assets bypass it), F9 for assets,
    # F1-F5 admission at extraction time (assets.go:89-100,459-474)
    gated = cand.filter(
        (
            F.col("__is_asset")
            & self_reference_guard(F.col("url"), F.col("parent_url"))
        )
        | (~F.col("__is_asset") & hop_gate(F.col("hop"), cfg))
    ).drop("__is_asset")
    return gated.filter(admission_predicate(cfg))


def sitespecific_candidates(
    ok: DataFrame, cfg: CrawlConfig, round_no: int
) -> DataFrame:
    """§2.7 — derived capture URLs (truthsocial API, facebook embed,
    libsyn CDN, telegram embed, ...) for this round's fetched rows,
    shaped as asset frontier candidates: hop = parent.hop (a derived
    capture is part of the same item, capture.go:213-315), seenchecked
    and admission-gated like any discovered URL.  The rewrite itself is
    all native columns (sitespecific.expansion_urls); rows not matching
    any branch expand to nothing, so on corpora without these hosts the
    operator is a no-op by construction."""
    from zeno_spark.operators import sitespecific as ss

    pairs = ss.expansion_urls(
        ok.select("url", F.col("hop").alias("parent_hop")),
        carry=("parent_hop",),
    )
    resolved = (
        pairs.withColumn(
            "__e", U.enrich_url_udf(F.col("parent_url"), F.col("url"))
        )
        .filter(F.col("__e.url").isNotNull())
        .drop("url")
    )
    cand = resolved.select(
        F.sha1(
            F.concat_ws("|", F.lit(round_no), F.col("__e.url"))
        ).alias("id"),
        F.col("__e.url").alias("url"),
        F.col("__e.url_hash").alias("url_hash"),
        F.col("__e.host").alias("host"),
        "parent_url",
        F.col("parent_hop").cast("int").alias("hop"),
        F.lit("asset").alias("type"),
        F.lit(False).alias("bypass_seencheck"),
        F.lit(0).alias("redirect"),
        F.lit(0).alias("retry"),
        discovered_seq(
            F.lit(round_no + 1), F.col("__e.url_hash")
        ).alias("enqueue_seq"),
        F.lit(round_no + 1).cast("int").alias("discovered_round"),
        F.lit(round_no + 1).cast("int").alias("not_before_round"),
        F.lit(0).alias("priority"),
    )
    return cand.filter(
        self_reference_guard(F.col("url"), F.col("parent_url"))
    ).filter(admission_predicate(cfg))


def redirect_candidates(
    redirects: DataFrame, cfg: CrawlConfig, round_no: int
) -> DataFrame:
    """X2/D5: 3xx rows -> continuation frontier rows for the Location
    target: same item id + hop + type, redirect+1, bounded by F7; target
    is seenchecked next round like any candidate (capture.go:142-158)."""
    from zeno_spark.operators.admission import redirect_gate

    resolved = (
        redirects.withColumn(
            "__e", U.enrich_url_udf(F.col("url"), F.col("redirect_to"))
        )
        .filter(F.col("__e.url").isNotNull())
        .filter(redirect_gate(F.col("redirect"), cfg))
        .filter(F.col("__e.url") != F.col("url"))  # self-redirect stop (capture.go:120-122)
    )
    return resolved.select(
        F.col("id"),  # redirect keeps the item id (capture.go:165-178)
        F.col("__e.url").alias("url"),
        F.col("__e.url_hash").alias("url_hash"),
        F.col("__e.host").alias("host"),
        F.col("url").alias("parent_url"),
        F.col("hop"),
        F.col("type"),
        F.lit(False).alias("bypass_seencheck"),
        (F.col("redirect") + 1).cast("int").alias("redirect"),
        F.lit(0).alias("retry"),
        discovered_seq(
            F.lit(round_no + 1), F.col("__e.url_hash")
        ).alias("enqueue_seq"),
        F.lit(round_no + 1).cast("int").alias("discovered_round"),
        F.lit(round_no + 1).cast("int").alias("not_before_round"),
        F.col("priority"),  # redirect continuation keeps the item's priority
    ).filter(admission_predicate(cfg))
