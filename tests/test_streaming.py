"""Structured Streaming live-stats surfaces (zeno_spark/streaming/live.py):
incremental exactly-once totals over the metrics table's commit stream,
and watermarked round-rate windows that drop late metric commits —
the reference's stats daemon / Prometheus exporter re-expressed
(crawl/api.go:34-110, crawl/stats.go:38)."""

from __future__ import annotations

import pytest

from zeno_spark import schemas
from zeno_spark.catalog import Catalog
from zeno_spark.streaming import live


def _m(rnd: int, host: str, ok: int) -> tuple:
    # (round, host, scheduled, fetched_ok, fetched_err, redirects,
    #  retries, discovered, new_after_dedup, payload_bytes, deduped_bytes)
    return (rnd, host, ok + 2, ok, 1, 0, 0, ok * 3, ok * 2, ok * 100, ok * 10)


def _append(spark, table, rows) -> None:
    table.append(spark.createDataFrame(rows, schemas.METRICS))


def test_host_totals_incremental_exactly_once(spark, tmp_path):
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    t = Catalog(spark, wh).table("metrics", schemas.METRICS)
    _append(spark, t, [_m(0, "a.com", 10), _m(0, "b.com", 4)])
    _append(spark, t, [_m(1, "a.com", 6), _m(1, "b.com", 5)])

    stream = live.host_totals(live.metrics_readstream(spark, wh))
    rows = live.run_available_now(stream, ckpt, "update")
    got = {r.host: r.fetched_ok for r in rows}
    assert got == {"a.com": 16, "b.com": 9}

    # a new round committed for ONE host: the checkpointed restart must
    # process only the new files and re-emit only the changed group
    _append(spark, t, [_m(2, "a.com", 7)])
    rows = live.run_available_now(stream, ckpt, "update")
    upd = {r.host: r.fetched_ok for r in rows}
    assert upd == {"a.com": 23}  # b.com unchanged -> not re-emitted


def test_round_rates_watermark_drops_late_commit(spark, tmp_path):
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    t = Catalog(spark, wh).table("metrics", schemas.METRICS)
    ok_by_round = {r: 10 * (r + 1) for r in range(5)}
    for r, ok in ok_by_round.items():
        _append(spark, t, [_m(r, "a.com", ok)])

    stream = live.round_rates(
        live.metrics_readstream(spark, wh),
        window_rounds=2, slide_rounds=1, late_rounds=1,
    )
    emitted = live.run_available_now(stream, ckpt, "append")

    # a VERY late duplicate commit for round 0 (5 rounds behind the
    # watermark) plus fresh rounds that advance it further
    _append(spark, t, [_m(0, "a.com", 999), _m(6, "a.com", 70)])
    emitted += live.run_available_now(stream, ckpt, "append")
    _append(spark, t, [_m(7, "a.com", 80)])
    emitted += live.run_available_now(stream, ckpt, "append")

    # append mode: every window at most once
    starts = [r.round_start for r in emitted]
    assert len(starts) == len(set(starts))
    # the windows covering round 0 must have finalized by now, WITHOUT
    # the late 999 contribution (dropped by the watermark)
    by_start = {r.round_start: r for r in emitted}
    assert by_start[-1].fetched_ok == ok_by_round[0]
    assert by_start[0].fetched_ok == ok_by_round[0] + ok_by_round[1]
    # every emitted window matches the batch aggregation over the
    # NON-LATE rows (window [s, s+2) sums rounds s and s+1)
    for r in emitted:
        want = sum(
            ok for rnd, ok in {**ok_by_round, 6: 70, 7: 80}.items()
            if r.round_start <= rnd < r.round_end
        )
        assert r.fetched_ok == want, f"window {r.round_start}: {r}"
        assert r.pages_per_round == pytest.approx(want / 2)
