"""Training-data pipeline tier (zeno_spark/datapipe): correctness
invariants that the driver's SQL-oracle gate can't express —
prefilter-completeness guarantees, ANN recall, binary-payload plumbing.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zeno_spark.datapipe import dedup as dd
from zeno_spark.datapipe import multimodal as mm
from zeno_spark.datapipe import similarity as sim
from zeno_spark.datapipe import text as tx

DOCS = [
    # near-duplicate cluster (high jaccard / low hamming)
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "the quick brown fox leaps over the lazy dog"),
    # exact duplicates
    (3, "spark shuffles keys to executors"),
    (4, "spark shuffles keys to executors"),
    # unrelated
    (5, "completely different content about image captions and crawling"),
    (6, "zz yy xx ww vv uu tt ss"),
    (7, "one two"),  # shorter than the shingle width
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup_groups_identical_texts(docs):
    out = {r.keep_doc_id: r.n_copies for r in dd.exact_dedup(docs).collect()}
    assert out[3] == 2           # 3 and 4 collapse, min id kept
    assert 4 not in out
    assert out[0] == 1


def test_jaccard_pairs_find_near_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b) for r in dd.jaccard_pairs(docs, t_num=7, t_den=10).collect()
    }
    assert (3, 4) in pairs        # identical => jaccard 1
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(5 in p or 6 in p for p in pairs)


def test_jaccard_prefix_filter_equals_allpairs(spark):
    """jaccard_pairs' prefix-filtered plan must return EXACTLY the naive
    all-pairs self-join's rows (the prefix-filter theorem), including
    n_inter/n_union values, across thresholds — on a corpus with dup
    clusters, partial overlaps, skewed token dfs, and singletons."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    for i in range(60):
        if i % 3 == 1:
            # near-dup of the previous doc: drop/replace a couple words
            base = rows[-1][1].split(" ")
            k = rng.integers(1, 3)
            for _ in range(k):
                base[rng.integers(0, len(base))] = vocab[rng.integers(0, 120)]
            rows.append((i, " ".join(base)))
        else:
            n = int(rng.integers(3, 18))
            toks = list(rng.choice(vocab[: 40 if i % 5 else 120], size=n))
            rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    for t_num, t_den in ((1, 2), (7, 10), (9, 10)):
        got = {
            (r.doc_a, r.doc_b, r.n_inter, r.n_union)
            for r in dd.jaccard_pairs(df, t_num=t_num, t_den=t_den).collect()
        }
        ref = {
            (r.doc_a, r.doc_b, r.n_inter, r.n_union)
            for r in dd.jaccard_pairs_allpairs(
                df, t_num=t_num, t_den=t_den
            ).collect()
        }
        assert got == ref, (
            f"prefix filter diverged at t={t_num}/{t_den}: "
            f"missing={ref - got} extra={got - ref}"
        )
    df.unpersist()


def test_phash_pairs_equals_brute_force(spark):
    """phash_pairs (pigeonhole block join + bit_count verify) must equal
    the all-pairs hamming scan exactly at the declared radius, across
    sign-bit phashes and multi-bit flips."""
    rng = np.random.default_rng(3)
    rows = []
    n = 0
    for _ in range(10):
        u = int(rng.integers(0, 2**64, dtype=np.uint64))
        for flips in (0, 1, 3, 4, 6):
            v = u
            for bit in rng.choice(64, size=flips, replace=False):
                v ^= 1 << int(bit)
            signed = v - (1 << 64) if v >= (1 << 63) else v
            rows.append((f"im{n:04d}", signed))
            n += 1
    df = spark.createDataFrame(rows, "id string, phash long")

    def ham(x: int, y: int) -> int:
        return bin((x ^ y) & (2**64 - 1)).count("1")

    want = {
        (ra[0], rb[0], ham(ra[1], rb[1]))
        for i, ra in enumerate(rows)
        for rb in rows[i + 1:]
        if ham(ra[1], rb[1]) <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in mm.phash_pairs(df, id_col="id", phash_col="phash").collect()
    }
    assert got == want
    assert want, "fixture produced no near-dup pairs — test is vacuous"


def test_phash_pairs_on_real_pixels(spark):
    """Integration: a re-noised copy of an image stays within the phash
    radius; an unrelated image does not."""
    from zeno_spark.functions.images import phash64

    rng = np.random.default_rng(5)
    grad = np.stack(
        [np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))] * 3, axis=-1
    )
    noisy = np.clip(
        grad.astype(np.int16) + rng.integers(-4, 5, size=grad.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=grad.shape).astype(np.uint8)
    df = spark.createDataFrame(
        [("orig", phash64(grad)), ("noisy", phash64(noisy)),
         ("other", phash64(other))],
        "id string, phash long",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in mm.phash_pairs(
            df, id_col="id", phash_col="phash", max_hamming=7
        ).collect()
    }
    assert ("noisy", "orig") in pairs or ("orig", "noisy") in pairs
    assert not any("other" in p for p in pairs)


def test_phash_near_dup_marks_match_brute_force(spark):
    """Crawl-sink perceptual dedupe (phash_near_dup_marks): every later
    image within the radius of an earlier one gets exactly one mark,
    pointing at its best earlier partner by (hamming, order); revisit /
    non-200 / null-phash rows are exempt."""
    rng = np.random.default_rng(11)
    rows = []
    base_hashes = [int(rng.integers(0, 2**64, dtype=np.uint64)) for _ in range(6)]
    n = 0
    for rnd in range(3):
        for u in base_hashes:
            v = u
            for bit in rng.choice(64, size=int(rng.integers(0, 4)), replace=False):
                v ^= 1 << int(bit)
            signed = v - (1 << 64) if v >= (1 << 63) else v
            status = 200 if n % 7 else 404          # some ineligible rows
            revisit = (n % 11 == 0)
            rows.append((f"http://h{n % 4}.example/p/{n}", rnd, status,
                         revisit, None if n % 13 == 0 else signed))
            n += 1
    df = spark.createDataFrame(
        rows, "url string, round int, status int, revisit boolean, phash long"
    )

    def ham(x, y):
        return bin((x ^ y) & (2**64 - 1)).count("1")

    elig = sorted(
        [(rnd, url, ph) for url, rnd, st, rv, ph in rows
         if st == 200 and not rv and ph is not None],
    )
    want = {}
    for i, (rnd, url, ph) in enumerate(elig):
        cands = [
            (ham(ph, ph2), rnd2, url2)
            for rnd2, url2, ph2 in elig[:i]
            if ham(ph, ph2) <= 3
        ]
        if cands:
            d, _, keeper = min(cands)
            want[url] = (keeper, d)
    got = {
        r.url: (r.near_dup_of, r.hamming)
        for r in mm.phash_near_dup_marks(df, max_hamming=3).collect()
    }
    assert got == want
    assert want, "fixture produced no near-dup marks — test is vacuous"


def test_minhash_lsh_subset_of_exact_and_finds_dups(docs):
    exact = {
        (r.doc_a, r.doc_b) for r in dd.jaccard_pairs(docs, t_num=7, t_den=10).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_pairs(docs, t_num=7, t_den=10).collect()
    }
    assert lsh <= exact           # verify step removes every false positive
    assert (3, 4) in lsh          # identical docs always share all bands


def test_simhash_pigeonhole_equals_brute_force(docs):
    """The block-join pair search must find EXACTLY the pairs a cross
    join would (pigeonhole completeness at hamming <= blocks-1)."""
    sh = dd.simhash(docs)
    a = sh.selectExpr("doc_id as doc_a", "simhash as ha")
    b = sh.selectExpr("doc_id as doc_b", "simhash as hb")
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("d", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("d") <= dd.SIMHASH_MAX_HAMMING)
        .collect()
    }
    blocked = {(r.doc_a, r.doc_b) for r in dd.simhash_pairs(docs).collect()}
    assert blocked == brute
    assert (3, 4) in blocked      # identical text -> identical simhash


def test_fingerprint_short_doc_falls_back_to_whole_text(docs):
    fp = {r.doc_id: r.fingerprint for r in tx.fingerprint(docs).collect()}
    import hashlib

    assert fp[7] == hashlib.md5(b"one two").hexdigest()
    assert fp[3] == fp[4]         # identical docs, identical fingerprints
    assert fp[0] != fp[5]


def test_langid_marker_scoring(spark):
    df = spark.createDataFrame(
        [(0, "the cat is on the mat and happy"),
         (1, "der hund und die katze und das haus"),
         (2, "xyzzy plugh")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in tx.langid(df).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"        # no markers at all


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, sim.DIM)).astype(np.float32)
    rows = []
    for i in range(40):
        v = base[i % 8] + rng.normal(scale=0.05, size=sim.DIM).astype(np.float32)
        rows.append((i, [float(x) for x in v], i % 8))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


def test_cosine_topk_matches_numpy(embeddings):
    got = sim.cosine_topk(embeddings, n_queries=4, k=3).collect()
    rows = embeddings.orderBy("vec_id").collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    for q in range(4):
        order = [
            int(i) for i in np.lexsort((np.arange(len(mat)), -sims[q])) if i != q
        ][:3]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == q]
        assert mine == order


def test_lsh_ann_recall_against_brute_force(embeddings):
    k = 3
    brute = sim.cosine_topk(embeddings, n_queries=8, k=k).collect()
    approx = sim.lsh_ann_topk(embeddings, n_queries=8, k=k).collect()
    btop = {(r.query_id, r.neighbor_id) for r in brute}
    atop = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(btop & atop) / len(btop)
    # clustered vectors land in shared sign-buckets; multiprobe hamming-1
    # must recover well over half of the true top-k
    assert recall >= 0.5, f"LSH ANN recall too low: {recall}"


def test_ivf_ann_recall_against_brute_force(embeddings):
    """IVF with nlist=8 cells / nprobe=2 on the 8-cluster fixture: a
    query's true neighbors are same-cluster vectors, which assign to the
    same (or adjacent) coarse cell the query probes first — recall must
    recover well over half of the true top-k."""
    k = 3
    brute = sim.cosine_topk(embeddings, n_queries=8, k=k).collect()
    approx = sim.ivf_topk(embeddings, n_queries=8, k=k, nlist=8, nprobe=2).collect()
    btop = {(r.query_id, r.neighbor_id) for r in brute}
    atop = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(btop & atop) / len(btop)
    assert recall >= 0.5, f"IVF ANN recall too low: {recall}"


def test_image_features_decode_roundtrip(spark):
    from zeno_spark.functions.images import encode_image, generate_pixels

    rows = []
    for i, fmt in [(0, "png"), (1, "jpeg")]:
        px = generate_pixels(seed=100 + i, w=24, h=16)
        rows.append((f"img-{i}", bytearray(encode_image(px, fmt)), fmt))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    feats = {r.image_id: r for r in mm.image_features(df).collect()}
    assert feats["img-0"].w == 24 and feats["img-0"].h == 16
    assert 0.0 <= feats["img-0"].brightness <= 255.0
    assert feats["img-0"].phash is not None


def test_resize_images_shapes(spark):
    from zeno_spark.functions.images import decode_image, encode_image, generate_pixels

    px = generate_pixels(seed=5, w=32, h=32)
    df = spark.createDataFrame(
        [("a", bytearray(encode_image(px, "png")), "png")],
        "image_id string, bytes binary, fmt string",
    )
    out = mm.resize_images(df, 8, 8).collect()[0]
    assert (out.w, out.h) == (8, 8)
    decoded = decode_image(bytes(out.bytes), "png")
    assert decoded.shape == (8, 8, 3)


def test_audio_features_real_wav(spark):
    """Real WAV decode end-to-end: a generated 440 Hz sine at known
    rate/length comes back with exact counts and the analytic RMS."""
    from zeno_spark.functions.audio import decode_wav, encode_wav

    rate, secs = 8000, 0.5
    t = np.arange(int(rate * secs)) / rate
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([mono, -mono], axis=1)
    df = spark.createDataFrame(
        [("mono", bytearray(encode_wav(mono, rate)), "wav"),
         ("stereo", bytearray(encode_wav(stereo, rate)), "wav")],
        "media_id string, bytes binary, fmt string",
    )
    got = {r.media_id: r for r in mm.audio_features(df).collect()}
    assert got["mono"].n_samples == 4000
    assert got["mono"].sample_rate == 8000
    assert got["mono"].channels == 1
    assert abs(got["mono"].duration_sec - 0.5) < 1e-9
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2); 16-bit quantization slack
    assert abs(got["mono"].rms - 0.5 / np.sqrt(2)) < 1e-3
    assert got["stereo"].channels == 2
    # codec round-trip within quantization error
    dec, r2 = decode_wav(encode_wav(mono, rate))
    assert r2 == rate and dec.shape == (4000, 1)
    assert np.abs(dec[:, 0] - mono).max() < 1.0 / 32767


def test_audio_video_stubs_are_gated(spark):
    df = spark.createDataFrame(
        [("m", bytearray(b"\x00\x01"), "mp3")],  # compressed: still gated
        "media_id string, bytes binary, fmt string",
    )
    with pytest.raises(Exception):  # NotImplementedError inside the executor
        mm.audio_features(df).collect()
    with pytest.raises(Exception):
        mm.sample_video_frames(df).collect()


def test_corrupt_media_payloads_are_skipped_not_task_failures(spark):
    """On a crawled corpus one truncated/hostile payload must never
    fail the Spark task: corrupt rows (ValueError from the codec) are
    dropped, valid rows in the same batch survive, and the gated-codec
    NotImplementedError stays loud (previous test)."""
    from zeno_spark.functions.audio import encode_wav
    from zeno_spark.functions.video import encode_y4m

    rate = 8000
    good_wav = encode_wav(np.zeros(100), rate)
    frames = [np.zeros((4, 4, 3), dtype=np.uint8)]
    good_y4m = encode_y4m(frames, fps=25)
    hostile = [
        b"",                                   # empty
        b"RIFF\x00\x00\x00\x00WAVE",           # truncated container
        good_wav[:20],                         # cut inside the fmt header
    ]
    # a file cut mid-DATA is not corruption: stdlib wave decodes the
    # frames that are present (partial capture tolerance)
    from zeno_spark.functions.audio import decode_wav

    partial, _ = decode_wav(good_wav[: len(good_wav) // 2])
    assert 0 < partial.shape[0] < 100
    df = spark.createDataFrame(
        [("good", bytearray(good_wav), "wav")]
        + [(f"bad{i}", bytearray(b), "wav") for i, b in enumerate(hostile)],
        "media_id string, bytes binary, fmt string",
    )
    got = {r.media_id for r in mm.audio_features(df).collect()}
    assert got == {"good"}

    vdf = spark.createDataFrame(
        [("good", bytearray(good_y4m), "y4m"),
         ("bad0", bytearray(b"YUV4MPEG2 W4 H4 F30:0\n"), "y4m"),
         ("bad1", bytearray(good_y4m[:-5]), "y4m"),   # truncated frame
         ("bad2", bytearray(b"not a video"), "y4m")],
        "media_id string, bytes binary, fmt string",
    )
    vgot = {r.media_id for r in mm.sample_video_frames(vdf, every_n=1).collect()}
    assert vgot == {"good"}


def test_video_frame_sampling_y4m(spark):
    """y4m frame sampling is REAL end-to-end: deterministic synthetic
    videos -> every_n-th frame re-encoded as PNG, pixels matching the
    source frames exactly (C444 grayscale survives BT.601 roundtrip)."""
    from zeno_spark.functions.images import decode_png
    from zeno_spark.functions.video import encode_y4m, iter_y4m_frames, video_info

    def frames_for(seed: int, n: int):
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            g = rng.integers(0, 256, size=(16, 20), dtype=np.uint8)
            out.append(np.stack([g, g, g], axis=-1))  # grayscale RGB
        return out

    vids = {"vidA": frames_for(1, 7), "vidB": frames_for(2, 4)}
    payloads = {k: encode_y4m(v, fps=25) for k, v in vids.items()}

    w, h, fps, n = video_info(payloads["vidA"])
    assert (w, h, fps, n) == (20, 16, 25.0, 7)
    decoded = [f for _, f in iter_y4m_frames(payloads["vidA"])]
    assert all((d == s).all() for d, s in zip(decoded, vids["vidA"]))

    df = spark.createDataFrame(
        [(k, bytearray(p), "y4m") for k, p in payloads.items()],
        "media_id string, bytes binary, fmt string",
    )
    rows = mm.sample_video_frames(df, every_n=3).collect()
    got = {(r.media_id, r.frame_idx): bytes(r.frame_bytes) for r in rows}
    # 7 frames @ every 3rd -> 0,3,6; 4 frames -> 0,3
    assert set(got) == {("vidA", 0), ("vidA", 3), ("vidA", 6), ("vidB", 0), ("vidB", 3)}
    for (mid, idx), png in got.items():
        assert (decode_png(png) == vids[mid][idx]).all()


def test_cosine_pairs_banded_vs_exact(embeddings):
    """The production pair operator (banded sign-LSH candidates + exact
    verify) against the O(n^2) baseline: always a subset (the verify is
    exact), and in the tight-near-dup regime the banding is for — the
    clustered fixture, same-cluster cos ~0.99 — recall stays high."""
    exact = {(r.vec_a, r.vec_b) for r in sim.cosine_pairs_exact(embeddings).collect()}
    banded = {(r.vec_a, r.vec_b) for r in sim.cosine_pairs(embeddings).collect()}
    assert banded <= exact
    assert exact, "fixture produced no near-dup pairs"
    recall = len(banded) / len(exact)
    assert recall >= 0.9, f"banded recall too low on tight clusters: {recall}"


def test_minhash_lsh_prunes_but_keeps_candidate_results(docs):
    """Result identity of the candidate-only verify: every LSH pair must
    carry the same (n_inter, n_union) the full jaccard join computes."""
    exact = {
        (r.doc_a, r.doc_b): (r.n_inter, r.n_union)
        for r in dd.jaccard_pairs(docs, t_num=7, t_den=10).collect()
    }
    for r in dd.minhash_lsh_pairs(docs, t_num=7, t_den=10).collect():
        assert exact[(r.doc_a, r.doc_b)] == (r.n_inter, r.n_union)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_vs_union_find(spark):
    """Generic CC (hash-min + pointer jumping) against brute-force
    union-find on a shape mix that forces multi-round convergence: a
    20-node chain (diameter 19 — pointer jumping must halve paths), a
    clique, a triangle reached through one bridge node, singletons."""
    from zeno_spark.datapipe import clusters as cl

    chain = [(i, i + 1) for i in range(100, 120)]
    clique = [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    bridge = [(300, 301), (301, 302), (302, 300), (302, 303)]
    edges = chain + clique + bridge
    nodes = sorted({n for e in edges for n in e} | {400, 401})
    want = _union_find(nodes, edges)

    nodes_df = spark.createDataFrame([(n,) for n in nodes], "node long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.cluster_id
        for r in cl.connected_components(nodes_df, edges_df).collect()
    }
    assert got == want


def test_dedup_clusters_match_union_find_over_simhash_pairs(docs):
    """dedup_clusters must equal union-find over the simhash pair graph:
    same components (component-min labels), correct sizes, exactly one
    keep per cluster, singletons kept."""
    from zeno_spark.datapipe import clusters as cl

    doc_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    pairs = [(r.doc_a, r.doc_b) for r in dd.simhash_pairs(docs).collect()]
    assert pairs, "fixture produced no near-dup pairs — test is vacuous"
    want = _union_find(doc_ids, pairs)

    rows = cl.dedup_clusters(docs).collect()
    assert {r.doc_id: r.cluster_id for r in rows} == want
    from collections import Counter

    sizes = Counter(want.values())
    for r in rows:
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.keep == int(r.doc_id == r.cluster_id)
    assert sum(r.keep for r in rows) == len(sizes)


def test_embedding_clusters_match_union_find(embeddings):
    """embedding_clusters ≡ union-find over the banded cosine pair graph
    (same pairs the dedup_embedding operator emits)."""
    from zeno_spark.datapipe import clusters as cl

    vec_ids = [r.vec_id for r in embeddings.select("vec_id").collect()]
    pairs = [(r.vec_a, r.vec_b) for r in sim.cosine_pairs(embeddings).collect()]
    assert pairs, "fixture produced no near-dup pairs — test is vacuous"
    want = _union_find(vec_ids, pairs)
    rows = cl.embedding_clusters(embeddings).collect()
    assert {r.vec_id: r.cluster_id for r in rows} == want
    assert sum(r.keep for r in rows) == len(set(want.values()))


def test_ivf_index_materialized_prunes_and_matches(spark, embeddings, tmp_path):
    """build_ivf_index writes the corpus partitioned by cell; the probe
    path (ivf_topk_indexed) must (a) return exactly what the in-memory
    ivf_topk returns on the same corpus/params, and (b) actually read
    ONLY the probed cells' partitions — partition pruning, not a full
    index rescan."""
    path = str(tmp_path / "ivf_idx")
    sim.build_ivf_index(embeddings, path, nlist=8)
    queries = embeddings.filter(F.col("vec_id") < 8)
    got = sim.ivf_topk_indexed(spark, path, queries, k=3, nprobe=2)
    want = sim.ivf_topk(embeddings, n_queries=8, k=3, nlist=8, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # pruning: the scan behind the result touches only the probed cells
    corpus = sim._with_norm2(
        embeddings.select("vec_id", "embedding"), "n2")
    cent = sim._ivf_centroids(corpus, 8)
    q = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    expect_cells = {
        r.p_cell for r in sim._ivf_probes(q, cent, 2).collect()
    }
    assert len(expect_cells) < 8  # pruning is non-trivial on this fixture
    # inputFiles() reports the UNPRUNED relation listing, so assert on
    # the executed plan: the probed cells ride as a literal
    # PartitionFilter, which is what makes the scan directory-pruned
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    inset = pf_line.split("IN (", 1)[1].split(")", 1)[0]
    pruned_to = {int(x) for x in inset.split(",")}
    assert pruned_to == expect_cells
    # one file per cell (the repartition-by-cell write discipline)
    import glob as _glob
    import os as _os

    for d in _glob.glob(_os.path.join(path, "cell=*")):
        parts = [p for p in _os.listdir(d) if p.endswith(".parquet")]
        assert len(parts) == 1, d
