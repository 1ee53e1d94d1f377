"""Host link-graph analytics (datapipe/graph.py): fixed-point integer
PageRank vs an independent pure-Python reference, degree exactness,
partitioning-invariance (the determinism the integer discipline buys),
and the frontier -> host-edge aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from zeno_spark.datapipe import graph as gr

# hand graph: 1->2, 1->3, 2->3, 3->1 (cycle), 4->3 (4 is dangling-in
# only... 4 has out-edge), 5 appears only as a dst (no out-edges:
# dangling), self-loop 6->6, and 7->5 so 5 has in-mass.
EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (6, 6), (7, 5),
    (1, 2),  # duplicate edge: must collapse (DISTINCT semantics)
]


def _pagerank_ref(edges, iters, dpct, scale):
    """Independent single-threaded reference of graph.pagerank's
    contract (module docstring): integer micro-unit ranks, floor
    divisions, dangling mass dropped."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out_deg = {}
    for u, _ in e:
        out_deg[u] = out_deg.get(u, 0) + 1
    base = (scale * (100 - dpct)) // 100
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for u, v in e:
            nxt[v] += ((rank[u] * dpct) // 100) // out_deg[u]
        rank = nxt
    return rank


def test_pagerank_matches_pure_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_micro"]
        for r in gr.pagerank(df, iters=4).collect()
    }
    want = _pagerank_ref(EDGES, 4, gr.PR_DAMPING_PCT, gr.PR_SCALE)
    assert got == want
    # the dangling node (5: no out-edges) still holds base + in-mass
    assert got[5] > (gr.PR_SCALE * 15) // 100


def test_pagerank_is_partitioning_invariant(spark):
    """Integer arithmetic => bit-identical under any shuffle layout."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = sorted(gr.pagerank(df, iters=3).collect())
    b = sorted(gr.pagerank(df.repartition(7, "dst"), iters=3).collect())
    assert a == b


def test_degrees_exact(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: (r["out_deg"], r["in_deg"])
        for r in gr.degrees(df).collect()
    }
    assert got == {
        1: (2, 1),   # dup edge 1->2 collapsed
        2: (1, 1),
        3: (1, 3),
        4: (1, 0),
        5: (0, 1),
        6: (1, 1),   # self-loop counts both sides
        7: (1, 0),
    }


def test_host_link_edges_aggregates_parent_to_host(spark):
    rows = [
        ("http://a.com/1", None, "a.com"),              # seed: no edge
        ("http://b.com/x", "http://a.com/1", "b.com"),
        ("http://b.com/y", "http://a.com/1", "b.com"),  # weight 2
        ("http://c.com/z", "http://b.com/x", "c.com"),
        ("http://c.com/w", "", "c.com"),                # empty parent
    ]
    frontier = spark.createDataFrame(
        rows, "url string, parent_url string, host string"
    )
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in gr.host_link_edges(frontier).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("b.com", "c.com"): 1}


def test_pagerank_total_mass_is_bounded(spark):
    """Dropped dangling mass + floor division only ever LOSE mass:
    sum(rank) <= n * scale after any number of iterations (a cheap
    global invariant that catches double-counted contributions)."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    out = gr.pagerank(df, iters=5)
    n = out.count()
    total = out.agg(F.sum("rank_micro")).collect()[0][0]
    assert total <= n * gr.PR_SCALE


# ---------------------------------------------------------------------------
# link-rank frontier prioritization (plans/crawl.py _rank_boost /
# _update_hostrank over this module's operators)
# ---------------------------------------------------------------------------

def _rank_corpus(spark):
    from zeno_spark import fixtures
    from zeno_spark.fixtures import build_metadata

    pages_meta, links, seeds = build_metadata(n_pages=120, n_hosts=6, seed=42)
    return (
        fixtures.attach_payloads(spark, pages_meta),
        spark.createDataFrame(links),
        spark.createDataFrame(seeds),
    )


def test_rank_priority_boosts_top_hosts(spark, tmp_path):
    from zeno_spark.config import CrawlConfig
    from zeno_spark.plans.crawl import CrawlJob

    pages, links, seeds = _rank_corpus(spark)
    # rank_priority_every=3 with max_rounds=5 => exactly ONE refresh
    # (after round 2), so the table's final content IS the state every
    # boosted row saw at discovery time
    cfg = CrawlConfig(max_hops=3, per_host_budget=4, max_rounds=5,
                      rank_priority=True, rank_priority_top=2,
                      rank_priority_every=3)
    job = CrawlJob(spark, str(tmp_path / "wh"), pages, links, cfg)
    job.run(seeds=seeds, max_rounds=5)

    top = {r.host for r in job.hostrank_tbl.read().collect()}
    assert 0 < len(top) <= 2

    # rows discovered in rounds 3+ (discovered_round >= 4) carry the
    # boost exactly when their host is in that state; rows from before
    # the refresh were never boosted
    rows = job.frontier.read().filter(
        F.col("redirect") == 0
    ).select("host", "priority", "discovered_round").collect()
    late = [r for r in rows if r.discovered_round >= 4]
    assert late
    for r in rows:
        want = 1 if (r.discovered_round >= 4 and r.host in top) else 0
        assert r.priority == want, r
    assert any(r.priority == 1 for r in late)


def test_rank_priority_reaches_same_fixpoint(spark, tmp_path):
    """Prioritization reorders WITHIN the politeness budget; an
    exhausted crawl fetches the same URL set either way."""
    from zeno_spark.config import CrawlConfig
    from zeno_spark.plans.crawl import CrawlJob

    pages, links, seeds = _rank_corpus(spark)
    base = dict(max_hops=2, per_host_budget=4, max_rounds=12)
    sets = []
    for i, extra in enumerate(
        ({}, dict(rank_priority=True, rank_priority_top=3,
                  rank_priority_every=1))
    ):
        job = CrawlJob(spark, str(tmp_path / f"wh{i}"), pages, links,
                       CrawlConfig(**base, **extra))
        job.run(seeds=seeds, max_rounds=12)
        sets.append({r.url for r in
                     job.fetched.read().select("url").collect()})
    assert sets[0] == sets[1]


def test_hostrank_refresh_is_incremental_and_equivalent(spark, tmp_path):
    """r4 verdict #7 done-criteria: (a) the per-round edge fold +
    rank refresh produce the IDENTICAL hostrank state a full frontier
    rescan would (retry/fold duplicates absorbed by the walk's
    distinct); (b) the refresh reads only the folded edge state — the
    frontier table is never touched."""
    from zeno_spark.config import CrawlConfig
    from zeno_spark.datapipe import graph as gr
    from zeno_spark.plans.crawl import CrawlJob

    pages, links, seeds = _rank_corpus(spark)
    cfg = CrawlConfig(max_hops=3, per_host_budget=4, max_rounds=5,
                      rank_priority=True, rank_priority_top=4,
                      rank_priority_every=1)
    job = CrawlJob(spark, str(tmp_path / "wh"), pages, links, cfg)
    job.run(seeds=seeds, max_rounds=5)

    # (a) equivalence: folded-state rank == full-frontier-scan rank
    full_edges = gr.host_link_edges(job.frontier.read()).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    ranks = gr.pagerank(full_edges, iters=cfg.rank_priority_iters)
    want = [
        (r.node, r.rank_micro)
        for r in ranks.orderBy(F.desc("rank_micro"), F.asc("node"))
        .limit(cfg.rank_priority_top).collect()
    ]
    got = [
        (r.host, r.rank_micro)
        for r in job.hostrank_tbl.read()
        .orderBy(F.desc("rank_micro"), F.asc("host")).collect()
    ]
    assert got == want
    # the folded table's DISTINCT edge set equals the full scan's
    fold = {(r.src_host, r.dst_host)
            for r in job.hostedges_tbl.read().collect()}
    scan = {(r.src_host, r.dst_host)
            for r in gr.host_link_edges(job.frontier.read()).collect()}
    assert fold == scan

    # (b) delta-only: a refresh on the established state must not read
    # the frontier table
    calls = []
    orig = job.frontier.read

    def _spy():
        calls.append(1)
        return orig()

    job.frontier.read = _spy
    try:
        job._update_hostrank()
    finally:
        job.frontier.read = orig
    assert calls == []
