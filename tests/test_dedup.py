"""Seen-check dedup: exactness of the anti-join (D1), deterministic
in-batch dedupe (D6), and the bloom prefilter's prefilter-only
discipline (D9: identical results with the filter on or off)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zeno_spark import schemas
from zeno_spark.functions.urls import fnv1a64
from zeno_spark.operators import dedup


def _cand(spark, urls, **kw):
    rows = []
    for i, u in enumerate(urls):
        base = dict(
            id=f"c{i}", url=u, url_hash=fnv1a64(u), host="h.com",
            parent_url=kw.get("parent_url"), hop=kw.get("hop", 1),
            type=kw.get("type", "seed"), bypass_seencheck=False, redirect=0,
            retry=0, enqueue_seq=kw.get("seq", i), discovered_round=1,
            not_before_round=1, priority=0,
        )
        rows.append(tuple(base[f.name] for f in schemas.FRONTIER.fields))
    return spark.createDataFrame(rows, schemas.FRONTIER)


def _seen(spark, urls):
    return spark.createDataFrame(
        [(fnv1a64(u), u, "seed", 0) for u in urls], schemas.SEEN
    )


def test_anti_join_exact(spark):
    cand = _cand(spark, [f"http://h.com/{i}" for i in range(20)])
    seen = _seen(spark, [f"http://h.com/{i}" for i in range(0, 20, 2)])
    new = dedup.anti_join_seen(cand, seen)
    assert {r.url for r in new.collect()} == {
        f"http://h.com/{i}" for i in range(1, 20, 2)
    }


def test_in_batch_dedupe_deterministic_winner(spark):
    # same url, same seq (seq is a function of (round, url)), different
    # hop/type/parent -> min (seq, hop, type, parent) wins
    rows = [
        ("a", "http://h.com/x", fnv1a64("http://h.com/x"), "h.com", "http://p2.com",
         3, "seed", False, 0, 0, 7, 1, 1, 0),
        ("b", "http://h.com/x", fnv1a64("http://h.com/x"), "h.com", "http://p1.com",
         2, "asset", False, 0, 0, 7, 1, 1, 0),
        ("c", "http://h.com/y", fnv1a64("http://h.com/y"), "h.com", None,
         1, "seed", False, 0, 0, 8, 1, 1, 0),
    ]
    df = spark.createDataFrame(rows, schemas.FRONTIER)
    out = {r.url: r for r in dedup.in_batch_dedupe(df).collect()}
    assert len(out) == 2
    assert out["http://h.com/x"].hop == 2  # min hop wins the tie
    assert out["http://h.com/x"].type == "asset"


def test_bloom_prefilter_identity(spark):
    """The north-rule bloom tier must never change results (SURVEY §7)."""
    cand = _cand(spark, [f"http://h{i % 7}.com/p/{i}" for i in range(500)])
    seen = _seen(spark, [f"http://h{i % 7}.com/p/{i}" for i in range(0, 500, 3)])
    plain = dedup.dedupe_against_seen(cand, seen, use_bloom=False)
    bloomed = dedup.dedupe_against_seen(cand, seen, use_bloom=True, n_buckets=8)
    assert {r.url for r in plain.collect()} == {r.url for r in bloomed.collect()}
    expected = {f"http://h{i % 7}.com/p/{i}" for i in range(500) if i % 3 != 0}
    assert {r.url for r in bloomed.collect()} == expected


def test_bloom_overflow_tier_is_exact(spark):
    """A bucket past the bloom size cap overflows to the CUCKOO tier:
    no false negatives (every seen candidate stays 'maybe'), and the
    exact anti-join result is unchanged."""
    cand = _cand(spark, [f"http://h.com/{i}" for i in range(100)])
    seen = _seen(spark, [f"http://h.com/{i}" for i in range(50)])
    blooms = dedup.build_bloom_index(seen, n_buckets=2, max_bits=64, min_bits=64)
    assert all(r.overflow for r in blooms.collect())  # cuckoo tier active
    tagged = dedup.bloom_prefilter(cand, blooms, n_buckets=2)
    # no false negatives: all 50 actually-seen candidates flagged maybe
    flagged = tagged.filter(F.col("maybe_seen")).select("url_hash", "url")
    really_seen = cand.join(seen.select("url_hash", "url"), ["url_hash", "url"])
    assert really_seen.join(flagged, ["url_hash", "url"], "left_anti").count() == 0
    # end-to-end result identical to the plain anti-join
    plain = {r.url for r in dedup.dedupe_against_seen(cand, seen, use_bloom=False).collect()}
    cuckooed = {
        r.url
        for r in dedup.dedupe_against_seen(cand, seen, use_bloom=True, n_buckets=2).collect()
    }
    assert plain == cuckooed and len(plain) == 50


def test_bloom_bucket_count_mismatch_fails_loudly(spark):
    """An index probed or merged under a different n_buckets than it was
    built with routes keys to the wrong bucket's filter — silent false
    negatives that break exact dedup.  The index records its bucket
    count and both paths must refuse the mismatch."""
    import pytest

    cand = _cand(spark, [f"http://h.com/{i}" for i in range(40)])
    seen = _seen(spark, [f"http://h.com/{i}" for i in range(20)])
    idx = dedup.build_bloom_index(seen, n_buckets=32)
    assert all(r.n_buckets == 32 for r in idx.collect())
    with pytest.raises(Exception, match="n_buckets"):
        dedup.bloom_prefilter(cand, idx, n_buckets=16).collect()
    with pytest.raises(Exception, match="n_buckets"):
        dedup.merge_bloom_index(
            idx, seen.select("url_hash"), n_buckets=16
        ).collect()


def test_cuckoo_kernels_no_false_negatives():
    """Direct kernel property: every inserted key queries 'maybe', for
    inputs that exercise the vectorized bulk pass, the b2 fallback, the
    kick loop, and the stash (duplicate-heavy + negative hashes)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(-(2 ** 62), 2 ** 62, size=4000, dtype=np.int64)
    hashes = np.concatenate([base, base[:500]])  # duplicates force kicks
    table, stash = dedup.cuckoo_build(hashes, load=0.95)
    assert dedup.cuckoo_query(table, stash, hashes).all()
    # empty input stays well-formed
    t0, s0 = dedup.cuckoo_build(np.array([], dtype=np.int64))
    assert not dedup.cuckoo_query(t0, s0, hashes[:5]).any()


def test_incremental_bloom_merge_no_false_negatives(spark):
    """merge_bloom_index: ORing round deltas into a persisted index must
    keep EVERY seen key 'maybe' (no false negatives), across multiple
    merges, fresh buckets, and capacity-forced rebuild flags."""
    r0 = [f"http://h.com/a{i}" for i in range(40)]
    r1 = [f"http://h.com/b{i}" for i in range(40)]
    r2 = [f"http://h.com/c{i}" for i in range(40)]
    idx = dedup.build_bloom_index(_seen(spark, r0), n_buckets=4, headroom=2)
    for delta in (r1, r2):
        merged = dedup.merge_bloom_index(
            idx, _seen(spark, delta), n_buckets=4
        )
        assert merged.filter(F.col("rebuild")).count() == 0  # headroom holds
        idx = merged.drop("rebuild")
    tagged = dedup.bloom_prefilter(
        _cand(spark, r0 + r1 + r2), idx, n_buckets=4
    )
    assert tagged.filter(~F.col("maybe_seen")).count() == 0

    # unseen keys mostly pass (the filter actually filters)
    fresh = dedup.bloom_prefilter(
        _cand(spark, [f"http://x.com/new{i}" for i in range(200)]),
        idx, n_buckets=4,
    )
    assert fresh.filter(~F.col("maybe_seen")).count() > 150


def test_incremental_bloom_flags_rebuild_on_capacity(spark):
    """A bucket whose design load would be exceeded is flagged (caller
    rebuilds from seen); tiny min_bits forces the flag immediately."""
    r0 = [f"http://h.com/a{i}" for i in range(10)]
    big = [f"http://h.com/b{i}" for i in range(200)]
    idx = dedup.build_bloom_index(
        _seen(spark, r0), n_buckets=1, min_bits=64, max_bits=1 << 20,
        headroom=1,
    )
    merged = dedup.merge_bloom_index(
        idx, _seen(spark, big), n_buckets=1, min_bits=64, max_bits=1 << 20
    )
    rows = merged.collect()
    assert len(rows) == 1 and rows[0].rebuild
    # the rebuild path (build from the union) restores no-false-negatives
    rebuilt = dedup.build_bloom_index(
        _seen(spark, r0 + big), n_buckets=1, headroom=2
    )
    tagged = dedup.bloom_prefilter(_cand(spark, r0 + big), rebuilt, n_buckets=1)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0
