"""End-to-end crawl: Spark BSP pipeline vs the single-threaded Python
oracle (FIXTURES.md §8 golden_crawl).

North-rule invariants checked:
  * identical crawl ordering — per round, per host, the FIFO-ordered list
    of scheduled URLs matches the oracle exactly
  * identical URL-seen set and fetched set (round, url, type, hop)
  * per-row content invariant — decoded pixels exact (png) / PSNR>=40dB
    (lossy stub) + caption byte-equality vs the deterministic generator
  * resumability — kill after round k, recover, finish: identical state
  * bloom tier + salting change nothing end-to-end

One full t1 crawl is shared across assertions (they're read-only); the
resume and bloom runs use a smaller corpus to keep the suite fast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zeno_spark import fixtures
from zeno_spark.config import CrawlConfig
from zeno_spark.fixtures import build_metadata, caption_for
from zeno_spark.functions.images import decode_image, generate_pixels, psnr
from zeno_spark.functions.urls import fnv1a64
from zeno_spark.oracle import crawl_oracle
from zeno_spark.plans.crawl import CrawlJob

CFG = CrawlConfig(max_hops=3, per_host_budget=8, max_rounds=20, compact_every=4)
SMALL_CFG = CrawlConfig(max_hops=2, per_host_budget=8, max_rounds=12, compact_every=3)


def _mk_corpus(spark, n_pages, n_hosts):
    pages_meta, links, seeds = build_metadata(n_pages=n_pages, n_hosts=n_hosts, seed=42)
    dfs = {
        "pages": fixtures.attach_payloads(spark, pages_meta).cache(),
        "links": spark.createDataFrame(links),
        "seeds": spark.createDataFrame(seeds),
    }
    dfs["pages"].count()
    return {"meta": (pages_meta, links, seeds), "dfs": dfs}


@pytest.fixture(scope="module")
def corpus(spark):
    return _mk_corpus(spark, 200, 10)


@pytest.fixture(scope="module")
def small_corpus(spark):
    return _mk_corpus(spark, 70, 6)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    pages_meta, links, seeds = corpus["meta"]
    return crawl_oracle(pages_meta, links, list(seeds["url"]), CFG, max_rounds=CFG.max_rounds)


@pytest.fixture(scope="module")
def small_oracle(small_corpus):
    pages_meta, links, seeds = small_corpus["meta"]
    return crawl_oracle(
        pages_meta, links, list(seeds["url"]), SMALL_CFG, max_rounds=SMALL_CFG.max_rounds
    )


@pytest.fixture(scope="module")
def full_run(spark, corpus, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh_full")
    job = CrawlJob(spark, str(wh), corpus["dfs"]["pages"], corpus["dfs"]["links"], CFG)
    stats = job.run(seeds=corpus["dfs"]["seeds"], max_rounds=CFG.max_rounds)
    return job, stats


def _state(job):
    seen = {r.url for r in job.seen.read().select("url").collect()}
    fetched = {
        (r.round, r.url, r.type, r.hop)
        for r in job.fetched.read().select("round", "url", "type", "hop").collect()
    }
    return seen, fetched


def test_crawl_matches_oracle(full_run, oracle_result):
    job, stats = full_run
    orc = oracle_result
    seen, fetched = _state(job)
    assert fetched == set(orc.fetched)
    assert seen == orc.seen
    per_round = {s.round: s.scheduled for s in stats if s.scheduled > 0}
    for rnd, sched in enumerate(orc.schedule):
        n = sum(len(v) for v in sched.values())
        if n:
            assert per_round.get(rnd) == n, f"round {rnd}"
    assert len([s for s in stats if s.scheduled > 0]) == len(
        [r for r in orc.schedule if r]
    )


def test_fetched_content_invariant(full_run):
    """input_hint per-row invariant over every fetched image row."""
    job, _ = full_run
    rows = (
        job.fetched.read()
        .filter(F.col("image_id").isNotNull())
        .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
        .collect()
    )
    assert rows, "crawl fetched no image rows"
    for r in rows:
        px_ref = generate_pixels(fnv1a64(r.image_id) & 0xFFFFFFFF, r.w, r.h)
        decoded = decode_image(bytes(r.bytes), r.fmt)
        if r.fmt == "png":
            assert (decoded == px_ref).all()
        else:
            assert psnr(px_ref, decoded) >= 40.0
        assert r.caption == caption_for(r.image_id)


def test_metrics_lineage(full_run):
    job, stats = full_run
    agg = {
        r.round: r.s
        for r in job.metrics.read()
        .groupBy("round")
        .agg(F.sum("scheduled").alias("s"))
        .collect()
    }
    for s in stats:
        if s.scheduled:
            assert agg[s.round] == s.scheduled


def test_crawl_ordering_matches_oracle(spark, small_corpus, small_oracle, tmp_path):
    """Within-host FIFO order, round by round, vs the oracle."""
    from pyspark.sql import Window

    from zeno_spark.operators.admission import apply_admission
    from zeno_spark.operators.schedule import politeness_schedule, schedulable

    job = CrawlJob(
        spark, str(tmp_path / "wh_ord"), small_corpus["dfs"]["pages"],
        small_corpus["dfs"]["links"], SMALL_CFG,
    )
    job.seed(small_corpus["dfs"]["seeds"])
    orc = small_oracle
    for rnd in range(min(5, orc.rounds)):
        pending = job.pending_frontier()
        gated = apply_admission(schedulable(pending, rnd), SMALL_CFG)
        sched = politeness_schedule(gated, SMALL_CFG)
        w = Window.partitionBy("host").orderBy(
            F.col("enqueue_seq").asc(), F.col("url_hash").asc()
        )
        got: dict[str, list[str]] = {}
        for r in (
            sched.withColumn("rk", F.row_number().over(w)).orderBy("host", "rk").collect()
        ):
            got.setdefault(r.host, []).append(r.url)
        want = orc.schedule[rnd] if rnd < len(orc.schedule) else {}
        assert got == want, f"round {rnd} schedule mismatch"
        job.run_round(rnd)


def test_resume_from_checkpoint(spark, small_corpus, small_oracle, tmp_path):
    """O12: run 2 rounds, 'crash' with partial round-2 commits, re-open,
    finish — identical final state; the partial commits roll back."""
    wh = tmp_path / "wh_res"
    job = CrawlJob(
        spark, str(wh), small_corpus["dfs"]["pages"], small_corpus["dfs"]["links"], SMALL_CFG
    )
    job.seed(small_corpus["dfs"]["seeds"])
    for rnd in range(2):
        job.run_round(rnd)
    # crash mid-round-2: partial table commits, no round marker
    job.fetched.append(job.fetched.read().limit(3))
    job.seen.append(
        spark.createDataFrame([(1, "http://junk/", "seed", 3)], job.seen.schema)
    )

    job2 = CrawlJob(
        spark, str(wh), small_corpus["dfs"]["pages"], small_corpus["dfs"]["links"], SMALL_CFG
    )
    stats = job2.run(max_rounds=SMALL_CFG.max_rounds)
    assert stats[0].round == 2  # resumed exactly after the last marker
    seen, fetched = _state(job2)
    assert seen == small_oracle.seen
    assert fetched == set(small_oracle.fetched)


def test_bloom_and_salt_change_nothing(spark, small_corpus, small_oracle, tmp_path):
    cfg = CrawlConfig(
        max_hops=2, per_host_budget=8, max_rounds=12, compact_every=3,
        bloom_prefilter=True, host_salt_buckets=4,
    )
    job = CrawlJob(
        spark, str(tmp_path / "wh_bloom"), small_corpus["dfs"]["pages"],
        small_corpus["dfs"]["links"], cfg,
    )
    job.run(seeds=small_corpus["dfs"]["seeds"], max_rounds=cfg.max_rounds)
    seen, fetched = _state(job)
    assert seen == small_oracle.seen
    assert fetched == set(small_oracle.fetched)
