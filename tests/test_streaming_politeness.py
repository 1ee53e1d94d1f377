"""Custom stateful streaming operator: AIMD adaptive politeness
budgets via applyInPandasWithState (streaming/politeness.py).

Covers: the AIMD control-law trajectory (golden), exactly-once
incremental draining with state carried across invocations (the
streamed updates over two drains must equal the batch replay over the
full history), and replays of already-folded rounds being ignored.
"""

from __future__ import annotations

import pytest

from zeno_spark import schemas
from zeno_spark.catalog import Catalog
from zeno_spark.streaming import politeness
from zeno_spark.streaming.live import metrics_readstream, run_available_now


def _m(rnd, host, scheduled, ok, err, retries, redirects=0):
    # (round, host, scheduled, fetched_ok, fetched_err, redirects,
    #  retries, discovered, new_after_dedup, payload_bytes, deduped_bytes)
    # Real metrics semantics: fetched_err counts EVERY non-200 row, so
    # redirect and retryable rows are inside it; `err` here is the
    # HARD-error count the controller recovers by subtraction.
    return (
        rnd, host, scheduled, ok, err + redirects + retries, redirects,
        retries, 0, 0, 0, 0,
    )


def _append(spark, table, rows):
    table.append(spark.createDataFrame(rows, schemas.METRICS))


@pytest.fixture()
def metrics_table(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh")).table(
        "metrics", schemas.METRICS
    )


def _drain(spark, tmp_path, ckpt_name="ckpt"):
    stream = politeness.adaptive_budgets(
        metrics_readstream(spark, str(tmp_path / "wh"))
    )
    return run_available_now(
        stream, str(tmp_path / ckpt_name), output_mode="update"
    )


def test_aimd_trajectory(spark, tmp_path, metrics_table):
    # clean.com: zero errors -> additive +4 per round from base 16
    # hot.com: retries every round -> multiplicative halving to the floor
    rows = []
    for rnd in range(4):
        rows.append(_m(rnd, "clean.com", 20, 20, 0, 0))
        rows.append(_m(rnd, "hot.com", 20, 10, 0, 10))
    _append(spark, metrics_table, rows)
    got = {
        (r.host, r.round): (r.budget, r.ewma_err)
        for r in _drain(spark, tmp_path)
    }
    assert [got[("clean.com", r)][0] for r in range(4)] == [20, 24, 28, 32]
    assert [got[("hot.com", r)][0] for r in range(4)] == [8, 4, 2, 1]
    # EWMA converges toward the 0.5 error rate on the hot host
    assert got[("hot.com", 3)][1] == pytest.approx(
        0.5 * (1 - 0.7 ** 4), rel=1e-9
    )


def test_redirects_are_not_errors(spark, tmp_path, metrics_table):
    """A once-throttled host that serves routine 3xx redirects (e.g.
    http->https 301s) alongside its 200s must still regain budget:
    redirects live inside fetched_err (the stats-parity definition) but
    are NOT hard errors to the control law.  And an all-429 round keeps
    err_rate at 1.0, not 2.0 (no double count of retryables)."""
    rows = [_m(0, "r.com", 16, 8, 0, 8)]          # halved: 16 -> 8
    for rnd in range(1, 5):                        # healthy + 1 redirect
        rows.append(_m(rnd, "r.com", 8, 7, 0, 0, redirects=1))
    rows.append(_m(0, "all429.com", 10, 0, 0, 10))
    _append(spark, metrics_table, rows)
    got = {
        (r.host, r.round): (r.budget, r.ewma_err)
        for r in _drain(spark, tmp_path)
    }
    # additive increase resumes once the EWMA decays below EWMA_OK
    # (round 0 err_rate = 0.5 -> ewma 0.15; pure decay thereafter:
    # 0.105 at round 1 (still >= 0.1, hold), 0.0735 at round 2 -> grow)
    assert [got[("r.com", r)][0] for r in range(5)] == [8, 8, 12, 16, 20]
    assert got[("all429.com", 0)][1] == pytest.approx(0.3)  # ALPHA*1.0


def test_incremental_equals_batch_replay(spark, tmp_path, metrics_table):
    first = [_m(0, "a.com", 10, 10, 0, 0), _m(0, "b.com", 10, 5, 2, 3),
             _m(1, "a.com", 14, 14, 0, 0)]
    _append(spark, metrics_table, first)
    got = {(r.host, r.round): r.budget for r in _drain(spark, tmp_path)}
    # second drain: state must CARRY (a.com continues from 24, not 16)
    second = [_m(2, "a.com", 18, 18, 0, 0), _m(1, "b.com", 5, 5, 0, 0),
              _m(2, "b.com", 5, 0, 5, 0)]
    _append(spark, metrics_table, second)
    got.update(
        {(r.host, r.round): r.budget for r in _drain(spark, tmp_path)}
    )
    replay = {
        (r.host, r.round): r.budget
        for r in politeness.replay_budgets(metrics_table.read()).collect()
    }
    assert got == replay
    assert got[("a.com", 2)] == 28  # 16 -> 20 -> 24 -> 28: carried state
    assert got[("b.com", 0)] == 8   # retries halve immediately


def test_replayed_rounds_ignored(spark, tmp_path, metrics_table):
    _append(spark, metrics_table, [_m(0, "a.com", 10, 10, 0, 0)])
    out1 = _drain(spark, tmp_path)
    # a late duplicate commit of round 0 plus a genuine round 1
    _append(spark, metrics_table,
            [_m(0, "a.com", 10, 10, 0, 0), _m(1, "a.com", 10, 10, 0, 0)])
    out2 = _drain(spark, tmp_path)
    assert [(r.round, r.budget) for r in out1] == [(0, 20)]
    # round 0's replay is ignored (already folded into state): only
    # round 1 emits, continuing from budget 20
    assert [(r.round, r.budget) for r in out2] == [(1, 24)]


def test_adaptive_crawl_respects_recommendations(spark, tmp_path):
    """cfg.adaptive_politeness end-to-end: every round r>=1 schedules
    each host at most its AIMD recommendation computed from the rounds
    committed BEFORE r (unseen hosts keep the base budget), and hosts
    that took retries in round r-1 are actually cut below base."""
    from pyspark.sql import functions as F

    from zeno_spark import fixtures
    from zeno_spark.config import CrawlConfig
    from zeno_spark.fixtures import build_metadata
    from zeno_spark.plans.crawl import CrawlJob

    pages_meta, links, seeds = build_metadata(n_pages=200, n_hosts=10, seed=42)
    pages = fixtures.attach_payloads(spark, pages_meta)
    cfg = CrawlConfig(
        max_hops=3, per_host_budget=8, host_salt_buckets=4,
        adaptive_politeness=True,
    )
    job = CrawlJob(
        spark, str(tmp_path / "wh"), pages,
        spark.createDataFrame(links), cfg,
    )
    job.run(seeds=spark.createDataFrame(seeds), max_rounds=6)
    metrics = job.metrics.read().collect()
    rounds = sorted({r.round for r in metrics})
    assert len(rounds) >= 3
    hist: list = []
    cut_below_base = 0
    for rnd in rounds:
        if hist:
            recs = {
                r.host: r.budget
                for r in politeness.replay_budgets(
                    spark.createDataFrame(hist, schemas.METRICS),
                    base=cfg.per_host_budget,
                    min_budget=cfg.adaptive_min_budget,
                    max_budget=cfg.adaptive_max_budget,
                )
                .groupBy("host")
                .agg(F.max_by("budget", "round").alias("budget"))
                .collect()
            }
            for m in (m for m in metrics if m.round == rnd):
                cap = recs.get(m.host, cfg.per_host_budget)
                assert m.scheduled <= cap, (rnd, m.host, m.scheduled, cap)
                if cap < cfg.per_host_budget:
                    cut_below_base += 1
        hist.extend(
            tuple(m[f.name] for f in schemas.METRICS.fields)
            for m in metrics if m.round == rnd
        )
    # the corpus serves 429s, so the control law must have bitten at
    # least once (otherwise this test is vacuous)
    assert cut_below_base > 0
    # the incrementally-folded state table (native fold_budgets_step,
    # one transition per committed round) must equal the full-history
    # Python replay — three forms of the control law, one answer
    state = {
        r.host: (r.budget, r.ewma_err, r.last_round)
        for r in job.budgets_tbl.read().collect()
    }
    replay = {
        r.host: (r.budget, r.ewma_err, r.round)
        for r in politeness.replay_budgets(
            job.metrics.read(), base=cfg.per_host_budget,
            min_budget=cfg.adaptive_min_budget,
            max_budget=cfg.adaptive_max_budget,
        )
        .groupBy("host")
        .agg(
            F.max_by("budget", "round").alias("budget"),
            F.max_by("ewma_err", "round").alias("ewma_err"),
            F.max("round").alias("round"),
        )
        .collect()
    }
    assert state.keys() == replay.keys()
    for h in state:
        sb, se, sr = state[h]
        rb, re_, rr = replay[h]
        assert (sb, sr) == (rb, rr), h
        assert se == pytest.approx(re_, rel=1e-12), h
