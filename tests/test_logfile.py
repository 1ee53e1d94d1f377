"""Structured per-round log (operators/logfile.py) — the reference's
internal/pkg/log analogue: JSONL records per round, size rotation with a
bounded backup chain (log.go fields-first records, rotate.go rotation).
"""

from __future__ import annotations

import json
import os

from zeno_spark import fixtures
from zeno_spark.config import CrawlConfig
from zeno_spark.operators.logfile import RoundLogger, StageTimer
from zeno_spark.plans.crawl import CrawlJob


def test_rotation_at_size_bounds_footprint(tmp_path):
    path = str(tmp_path / "logs" / "crawl.jsonl")
    lg = RoundLogger(path, max_bytes=500, keep=3)
    for i in range(100):
        lg.log("round_end", round=i, scheduled=i * 10)
    # live file bounded by max_bytes
    assert os.path.getsize(path) <= 500
    # backup chain exists and is bounded at `keep`
    backups = [f"{path}.{i}" for i in (1, 2, 3) if os.path.exists(f"{path}.{i}")]
    assert len(backups) == 3
    assert not os.path.exists(f"{path}.4")
    for b in backups:
        assert os.path.getsize(b) <= 500
    # rotated read-back is oldest-first and the newest record is last
    recs = lg.records(include_rotated=True)
    rounds = [r["round"] for r in recs]
    assert rounds == sorted(rounds)
    assert rounds[-1] == 99


def test_records_are_one_json_object_per_line(tmp_path):
    path = str(tmp_path / "crawl.jsonl")
    lg = RoundLogger(path)
    lg.log("seeded", urls=42)
    lg.log("round_start", round=0)
    with open(path) as fh:
        lines = fh.readlines()
    assert len(lines) == 2
    first = json.loads(lines[0])
    assert first["event"] == "seeded" and first["urls"] == 42
    assert first["level"] == "info" and "ts" in first


def test_stage_timer_accumulates():
    t = {"now": 0.0}
    timer = StageTimer(clock=lambda: t["now"])
    with timer.stage("fetch"):
        t["now"] += 1.5
    with timer.stage("fetch"):
        t["now"] += 0.5
    with timer.stage("commit"):
        t["now"] += 2.0
    assert timer.timings == {"t_fetch": 2.0, "t_commit": 2.0}


def test_crawl_writes_round_records_with_stage_timings(spark, tmp_path):
    pages_meta, links, seeds = fixtures.build_metadata(
        n_pages=40, n_hosts=4, seed=7
    )
    dfs = {
        "pages": fixtures.attach_payloads(spark, pages_meta),
        "links": spark.createDataFrame(links),
        "seeds": spark.createDataFrame(seeds),
    }
    cfg = CrawlConfig(max_hops=2, per_host_budget=8, max_rounds=4,
                      compact_every=2)
    job = CrawlJob(spark, str(tmp_path / "wh"), dfs["pages"], dfs["links"], cfg)
    stats = job.run(seeds=dfs["seeds"], max_rounds=cfg.max_rounds)
    recs = job.logger.records()
    by_event = {}
    for r in recs:
        by_event.setdefault(r["event"], []).append(r)
    assert len(by_event["seeded"]) == 1
    assert len(by_event["round_start"]) == len(stats)
    ends = by_event["round_end"]
    assert len(ends) == len(stats)
    for rec, st in zip(sorted(ends, key=lambda r: r["round"]), stats):
        # counter block mirrors RoundStats exactly
        assert rec["scheduled"] == st.scheduled
        assert rec["fetched_ok"] == st.fetched_ok
        assert rec["new_after_dedup"] == st.new_after_dedup
        # per-stage driver timings present and sane
        for k in ("t_fetch", "t_sink_commit", "t_state_commit", "t_totals"):
            assert k in rec and rec[k] >= 0
    assert len(by_event["crawl_finished"]) == 1
    # compaction fired at compact_every=2 and was timed
    assert any("t_compact" in r for r in ends)


def test_structured_log_off_writes_nothing(spark, tmp_path):
    pages_meta, links, seeds = fixtures.build_metadata(
        n_pages=20, n_hosts=2, seed=7
    )
    dfs = {
        "pages": fixtures.attach_payloads(spark, pages_meta),
        "links": spark.createDataFrame(links),
        "seeds": spark.createDataFrame(seeds),
    }
    cfg = CrawlConfig(max_hops=1, per_host_budget=8, max_rounds=2,
                      structured_log=False)
    job = CrawlJob(spark, str(tmp_path / "wh"), dfs["pages"], dfs["links"], cfg)
    job.run(seeds=dfs["seeds"], max_rounds=2)
    assert job.logger is None
    assert not os.path.exists(str(tmp_path / "wh" / "_logs"))
