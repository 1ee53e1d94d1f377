"""Streaming CONTENT surfaces (zeno_spark/streaming/content.py):
incremental exactly-once per-host corpus accounting and watermarked
round-window content stats over the fetched table's commit stream."""

from __future__ import annotations

from zeno_spark import schemas
from zeno_spark.catalog import Catalog
from zeno_spark.streaming import content, live


def _row(rnd, host, i, revisit=False, caption="alpha beta gamma",
         fmt="png", w=16, h=16):
    url = f"http://{host}/p/{rnd}/{i}"
    return (
        url, hash(url) % (1 << 40), host, f"im{i}",
        None,                        # bytes — never read by the stream
        w if fmt else None, h if fmt else None, fmt,
        caption, 42 + i, 200, "seed", 0, rnd,
        f"digest{i % 3}", revisit, None, None,
    )


def _append(spark, t, rows):
    t.append(spark.createDataFrame(rows, schemas.FETCHED))


def test_host_content_totals_incremental(spark, tmp_path):
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    t = Catalog(spark, wh).table("fetched", schemas.FETCHED)
    _append(spark, t, [
        _row(0, "a.com", 0), _row(0, "a.com", 1, revisit=True),
        _row(0, "b.com", 2, caption="one two"),
    ])

    stream = content.host_content_totals(
        content.fetched_readstream(spark, wh))
    rows = live.run_available_now(stream, ckpt, "update")
    got = {r.host: r for r in rows}
    assert got["a.com"].captures == 2
    assert got["a.com"].revisits == 1
    assert got["a.com"].caption_tokens == 6
    assert got["a.com"].images == 2
    assert got["a.com"].pixels == 2 * 16 * 16
    assert got["b.com"].caption_tokens == 2

    # restart from the checkpoint: only the new commit's host re-emits
    _append(spark, t, [_row(1, "b.com", 3, fmt=None, w=None, h=None)])
    rows = live.run_available_now(stream, ckpt, "update")
    upd = {r.host: r for r in rows}
    assert set(upd) == {"b.com"}
    assert upd["b.com"].captures == 2
    assert upd["b.com"].images == 1  # the fmt=None row isn't an image


def test_round_content_windows_watermark(spark, tmp_path):
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    t = Catalog(spark, wh).table("fetched", schemas.FETCHED)
    for rnd in range(4):
        _append(spark, t, [
            _row(rnd, "a.com", 10 * rnd + i,
                 revisit=(i == 0)) for i in range(rnd + 1)
        ])
    stream = content.round_content_windows(
        content.fetched_readstream(spark, wh),
        window_rounds=2, slide_rounds=1, late_rounds=1,
    )
    emitted = live.run_available_now(stream, ckpt, "append")
    # very late round-0 commit (dropped) + fresh rounds advancing the
    # watermark so earlier windows finalize
    _append(spark, t, [_row(0, "a.com", 999)])
    _append(spark, t, [_row(5, "a.com", 50)])
    emitted += live.run_available_now(stream, ckpt, "append")
    _append(spark, t, [_row(6, "a.com", 60)])
    emitted += live.run_available_now(stream, ckpt, "append")

    starts = [r.round_start for r in emitted]
    assert len(starts) == len(set(starts))  # append: each window once
    by_start = {r.round_start: r for r in emitted}
    # window [-1,1) = round 0 only: 1 capture, late 999 row dropped
    assert by_start[-1].captures == 1
    # window [0,2) = rounds 0+1 = 1+2 captures, 2 revisits
    assert by_start[0].captures == 3
    assert by_start[0].revisits == 2
    assert by_start[0].revisit_ratio == 2 / 3
