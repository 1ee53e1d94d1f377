"""Embedding similarity search over an ``array<float>`` column.

Two tiers, as a 100 TB pipeline needs:

  * brute-force cosine top-k — the exactness baseline.  Queries are a
    small set -> broadcast; the corpus scan is the only big side; the
    dot product runs JVM-side (``zip_with`` + ``aggregate`` inside
    codegen — no Python, no explode of 64-row vectors).
  * LSH-bucketed ANN — random-hyperplane signatures put near vectors in
    shared buckets; candidate generation becomes an equi-join on the
    bucket key and only candidates get the exact dot product.  Recall
    <1 by construction (verified against brute force in tests), so this
    one is benchmarked, not oracle-checked.

Floating-point parity with the DuckDB oracle: both engines evaluate the
SAME expression tree — left-fold sum of per-index double products, then
dot / (sqrt(na2) * sqrt(nb2)) — so doubles are IEEE-identical and the
integer (query_id, neighbor_id, rank) output hashes equal.

The hyperplanes are a pure function of (plane, dim) — no RNG state, no
driver-side matrix to ship; executors recompute the constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 12      # LSH signature bits
IVF_NLIST = 16     # IVF coarse cells (production: ~sqrt(n), k-means)
IVF_NPROBE = 4     # cells probed per query
COS_PAIR_TAU = 0.4  # near-dup threshold for this corpus (max cos ~0.51)
PAIR_BANDS = 6     # cosine_pairs: 6 bands x 2 bits of the signature

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0 as double), (acc, v) -> acc + v)"
)
_NORM2 = (
    "aggregate(transform({e}, x -> cast(x as double) * cast(x as double)), "
    "cast(0 as double), (acc, v) -> acc + v)"
)

# series bound derived from the list itself (not a hardcoded DIM) so a
# corpus with a different embedding width fails loudly in the compare
# instead of silently truncating the dot product
_DOT_SQL = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)
_NORM2_SQL = (
    "list_reduce(list_transform(generate_series(1, len({e})), "
    "i -> {e}[i]::DOUBLE * {e}[i]::DOUBLE), (x, y) -> x + y)"
)


def _with_norm2(df: DataFrame, out: str) -> DataFrame:
    return df.withColumn(out, F.expr(_NORM2.format(e="embedding")))


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors by cosine for the first ``n_queries``
    vectors (vec_id < n_queries), self excluded.  Output: query_id,
    neighbor_id, rank — integers only, rank tie-broken by neighbor_id.

    Plan shape: broadcast(queries) x corpus scan -> one narrow pass
    computing dot/norms in codegen -> per-query top-k window over
    n_queries*N rows partitioned by query (no global sort).
    """
    corpus = _with_norm2(embeddings.select("vec_id", "embedding"), "n2")
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.expr(_DOT.format(a="q_emb", b="embedding"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("n2")))
            ).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_topk_sql(
    table: str = "embeddings", n_queries: int = 20, k: int = 5
) -> str:
    dot = _DOT_SQL.format(dim=DIM, a="q.embedding", b="c.embedding")
    qn2 = _NORM2_SQL.format(dim=DIM, e="q.embedding")
    cn2 = _NORM2_SQL.format(dim=DIM, e="c.embedding")
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {dot} / (sqrt({qn2}) * sqrt({cn2})) AS cos
      FROM {table} q JOIN {table} c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {n_queries})
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS "rank"
    FROM scored
    QUALIFY "rank" <= {k}
    """


def cosine_pairs_exact(embeddings: DataFrame, tau: float = COS_PAIR_TAU) -> DataFrame:
    """All-pairs cosine >= tau by block-nested pair scan — O(n^2), the
    small-corpus EXACTNESS BASELINE the bucketed production operator's
    recall is measured against in tests.  Never the production path."""
    corpus = _with_norm2(embeddings.select("vec_id", "embedding"), "n2")
    a = corpus.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("n2").alias("na2"),
    )
    b = corpus.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("n2").alias("nb2"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="emb_a", b="emb_b"))
            / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
        )
        .filter(F.col("cos") >= tau)
        .select("vec_a", "vec_b")
    )


def cosine_pairs(
    embeddings: DataFrame, tau: float = COS_PAIR_TAU, bands: int = PAIR_BANDS
) -> DataFrame:
    """Embedding near-duplicate pairs: candidates = pairs agreeing on at
    least one band of the deterministic sign-LSH signature (band
    equi-join — never a cross join), then exact cosine >= tau inside the
    candidate set.  Output: vec_a, vec_b (integers).

    The banding is part of the operator's DECLARED SEMANTICS (like
    dedup's DF_CAP): a cosine threshold gives no hard bound on signature
    hamming distance, so no signature scheme can be both exact and
    sub-quadratic; production embedding dedup (IVF/SemDeDup-style)
    accepts bucketed recall by design.  Recall vs the exact baseline is
    measured in tests (tight near-dup regimes — the ones that matter at
    production tau ~0.9+ — band-collide with high probability; this
    corpus' loose tau=0.4 regime is the worst case).  The DuckDB oracle
    applies the IDENTICAL banding, so the check is exact.
    """
    rows = N_PLANES // bands
    sig = F.expr(lsh_signature_expr("embedding"))
    corpus = (
        _with_norm2(embeddings.select("vec_id", "embedding"), "n2")
        .withColumn("sig", sig)
    )
    band_keys = F.array(
        *[
            F.expr(f"shiftright(sig, {b * rows}) & {(1 << rows) - 1}")
            for b in range(bands)
        ]
    )
    from zeno_spark.datapipe.partitioning import spread_for_join

    banded = spread_for_join(
        corpus.select("vec_id", F.posexplode(band_keys).alias("band", "bkey")),
        "band", "bkey",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ca = corpus.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("n2").alias("na2"),
    )
    cb = corpus.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("n2").alias("nb2"),
    )
    return (
        cand.join(ca, "vec_a")
        .join(cb, "vec_b")
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="emb_a", b="emb_b"))
            / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
        )
        .filter(F.col("cos") >= tau)
        .select("vec_a", "vec_b")
    )


def cosine_pairs_sql(
    table: str = "embeddings", tau: float = COS_PAIR_TAU, bands: int = PAIR_BANDS
) -> str:
    """Oracle with the IDENTICAL banded candidate generation (same
    deterministic hyperplanes, same band split) + exact cosine verify."""
    rows = N_PLANES // bands
    dot = _DOT_SQL.format(a="a.embedding", b="b.embedding")
    na2 = _NORM2_SQL.format(e="a.embedding")
    nb2 = _NORM2_SQL.format(e="b.embedding")
    band_keys = ", ".join(
        f"(sig >> {b * rows}) & {(1 << rows) - 1}" for b in range(bands)
    )
    return f"""
    WITH sigs AS (
      SELECT vec_id, embedding, {lsh_signature_sql('embedding')} AS sig
      FROM {table}),
    banded AS (
      SELECT vec_id, unnest(generate_series(0, {bands - 1})) AS band,
             unnest([{band_keys}]) AS bkey
      FROM sigs),
    cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
    SELECT vec_a, vec_b
    FROM cand
    JOIN {table} a ON a.vec_id = vec_a
    JOIN {table} b ON b.vec_id = vec_b
    WHERE {dot} / (sqrt({na2}) * sqrt({nb2})) >= {tau}
    """


# ---------------------------------------------------------------------------
# LSH tier (approximate; benchmarked + recall-tested, not oracle-checked)
# ---------------------------------------------------------------------------

def _plane_component(p: int, d: int) -> str:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    a Weyl-sequence hash of (plane, dim) — identical on every executor,
    nothing to broadcast."""
    return (
        f"(cast(({p * DIM + d + 1} * 2654435761) % 4294967296 as double) "
        f"/ 2147483648.0 - 1.0)"
    )


def lsh_signature_expr(emb: str = "embedding") -> str:
    """SQL expr: N_PLANES-bit sign signature of the embedding."""
    bits = []
    for p in range(N_PLANES):
        proj = " + ".join(
            f"cast(element_at({emb}, {d + 1}) as double) * {_plane_component(p, d)}"
            for d in range(DIM)
        )
        bits.append(f"(case when ({proj}) >= 0 then {1 << p} else 0 end)")
    return "(" + " + ".join(bits) + ")"


def _plane_component_value(p: int, d: int) -> float:
    """The exact double the Spark expr constant-folds to: every step
    (int multiply, mod 2^32, divide by 2^31, minus 1) is IEEE-exact, so
    Python and Spark compute the identical value."""
    return ((p * DIM + d + 1) * 2654435761) % 4294967296 / 2147483648.0 - 1.0


def lsh_signature_sql(emb: str = "embedding") -> str:
    """DuckDB port of lsh_signature_expr: same hyperplanes (embedded as
    exact repr'd doubles), same left-assoc sum order, same sign rule —
    signatures are bit-identical to the Spark side."""
    bits = []
    for p in range(N_PLANES):
        proj = " + ".join(
            f"{emb}[{d + 1}]::DOUBLE * ({_plane_component_value(p, d)!r})"
            for d in range(DIM)
        )
        bits.append(f"(CASE WHEN ({proj}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def lsh_ann_topk(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose signature is
    within hamming 1 of the query signature (multi-probe over N_PLANES+1
    buckets), exact cosine re-rank inside the candidate set.
    Output: query_id, neighbor_id, rank."""
    sig = F.expr(lsh_signature_expr("embedding"))
    corpus = _with_norm2(embeddings.select("vec_id", "embedding"), "n2").withColumn(
        "sig", sig
    )
    # multi-probe: each corpus vector registers under its own bucket;
    # each query probes its bucket plus all hamming-1 buckets
    probes = F.array(
        F.col("sig"), *[F.expr(f"sig ^ {1 << p}") for p in range(N_PLANES)]
    )
    queries = (
        corpus.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("n2").alias("q_n2"),
            F.explode(probes).alias("bucket"),
        )
    )
    cand = F.broadcast(queries).join(
        corpus,
        (F.col("bucket") == F.col("sig")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.expr(_DOT.format(a="q_emb", b="embedding"))
            / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("n2")))
        ).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-partitioned ANN top-k (the coarse-quantizer tier next to the
    sign-LSH tier): the corpus is partitioned into ``nlist`` cells by
    nearest coarse centroid, a query probes its ``nprobe`` closest cells,
    and only vectors in probed cells get the exact cosine re-rank.
    Output: query_id, neighbor_id, rank — same contract as the other
    top-k operators.

    Centroids here are a DETERMINISTIC data sample — the ``nlist``
    corpus vectors with the smallest Knuth-hash of vec_id (the slot a
    production build fills with k-means output; sampled seeds are the
    standard k-means init, so the structure is identical).  Everything
    downstream is a pure expression, so an exact DuckDB oracle exists
    (ivf_topk_sql) despite the operator being "approximate" vs brute
    force — approximation error is recall (measured in tests), not
    nondeterminism.

    100 TB plan shape: centroids are tiny (nlist rows) -> broadcast;
    cell ASSIGNMENT is one narrow map over the corpus (broadcast
    nested-loop against nlist rows + a per-vector argmax window keyed by
    vec_id).  The QUERY path touches only nprobe/nlist of the corpus —
    and with the index MATERIALIZED by ``build_ivf_index`` (parquet
    partitioned by `cell`), ``ivf_topk_indexed`` makes that literal:
    partition pruning reads only the probed cells' files.  This
    in-memory form recomputes the assignment (the one-shot /
    oracle-checked path); the indexed form is the production path at
    10^9+ vectors.
    """
    corpus = _with_norm2(embeddings.select("vec_id", "embedding"), "n2")
    cent = _ivf_centroids(corpus, nlist)
    assigned = _ivf_assign(corpus, cent)
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    probes = _ivf_probes(queries, cent, nprobe)
    return _ivf_rerank(probes, assigned, k)


def _ivf_centroids(corpus: DataFrame, nlist: int) -> DataFrame:
    """Deterministic coarse centroids: the nlist corpus vectors with the
    smallest Knuth-hash of vec_id (k-means-init slot)."""
    cent_key = F.expr("(cast(vec_id as bigint) * 2654435761) % 4294967296")
    return (
        corpus.orderBy(cent_key.asc(), F.col("vec_id").asc())
        .limit(nlist)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
            F.col("n2").alias("c_n2"),
        )
    )


def _ivf_assign(corpus: DataFrame, cent: DataFrame) -> DataFrame:
    """Argmax-cosine cell assignment: one narrow broadcast pass."""
    from pyspark.sql import Window

    cos_to_cent = (
        F.expr(_DOT.format(a="embedding", b="c_emb"))
        / (F.sqrt(F.col("n2")) * F.sqrt(F.col("c_n2")))
    ).alias("ccos")
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    return (
        corpus.crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "n2", "centroid_id", cos_to_cent)
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "embedding", "n2", F.col("centroid_id").alias("cell"))
    )


def _ivf_probes(queries: DataFrame, cent: DataFrame, nprobe: int) -> DataFrame:
    """Each query's nprobe nearest cells (query_id, q_emb, q_n2, p_cell)."""
    from pyspark.sql import Window

    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    return (
        queries.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "q_emb", "q_n2", "centroid_id",
            (
                F.expr(_DOT.format(a="q_emb", b="c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("ccos"),
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(
            "query_id", "q_emb", "q_n2", F.col("centroid_id").alias("p_cell")
        )
    )


def _ivf_rerank(probes: DataFrame, assigned: DataFrame, k: int) -> DataFrame:
    """Exact cosine re-rank of probed cells' vectors.  Each corpus
    vector lives in exactly ONE cell and a query's probe cells are
    distinct -> no duplicate (query, neighbor) rows, no dedupe shuffle
    (unlike multi-probe LSH)."""
    from pyspark.sql import Window

    scored = (
        F.broadcast(probes)
        .join(assigned, F.col("p_cell") == F.col("cell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.expr(_DOT.format(a="q_emb", b="embedding"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("n2")))
            ).alias("cos"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def build_ivf_index(
    embeddings: DataFrame, path: str, nlist: int = IVF_NLIST
) -> None:
    """Materialize the IVF index: the cell-assigned corpus written as
    parquet PARTITIONED BY cell (the Iceberg/Hive partition transform),
    plus the centroid table under ``_centroids`` (the leading underscore
    hides it from the data scan's file listing).  One assignment pass at
    build time; every probe afterwards reads only nprobe cells' files —
    the partition-pruned scan promised by the ivf_topk docstring, now
    real.  At 10^9+ vectors this is the only shape that works: the
    probe cost is nprobe/nlist of the corpus, not a rescan."""
    corpus = _with_norm2(embeddings.select("vec_id", "embedding"), "n2")
    cent = _ivf_centroids(corpus, nlist)
    assigned = _ivf_assign(corpus, cent)
    # one file per cell: repartition on the partition column before the
    # partitioned write (otherwise every task writes every cell it saw)
    (
        assigned.repartition(nlist, F.col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    )
    cent.write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Probe a materialized IVF index (build_ivf_index): pick each
    query's nprobe cells from the tiny centroid table, then scan ONLY
    those cells' partitions (driver collects the probed cell ids —
    bounded by n_queries*nprobe ints — and pushes them as a literal
    partition filter, so the parquet scan lists/reads just those
    directories).  Results are identical to ivf_topk on the same corpus
    and parameters; equality is pinned in tests together with the
    partition-pruning assertion."""
    cent = spark.read.parquet(f"{path}/_centroids")
    q = _with_norm2(queries.select("vec_id", "embedding"), "q_n2").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("q_n2"),
    )
    probes = _ivf_probes(q, cent, nprobe).localCheckpoint(eager=True)
    cells = [r.p_cell for r in probes.select("p_cell").distinct().collect()]
    assigned = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return _ivf_rerank(probes, assigned, k)


def ivf_topk_sql(
    table: str = "embeddings",
    n_queries: int = 20,
    k: int = 5,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
) -> str:
    """Exact DuckDB oracle for ivf_topk: identical centroid pick
    (Knuth-hash order), identical argmax assignment, identical probe
    set, IEEE-identical cosine tree."""
    a_dot = _DOT_SQL.format(a="t.embedding", b="c.c_emb")
    a_tn2 = _NORM2_SQL.format(e="t.embedding")
    a_cn2 = _NORM2_SQL.format(e="c.c_emb")
    q_dot = _DOT_SQL.format(a="q.embedding", b="c.c_emb")
    q_qn2 = _NORM2_SQL.format(e="q.embedding")
    s_dot = _DOT_SQL.format(a="p.q_emb", b="v.embedding")
    s_qn2 = _NORM2_SQL.format(e="p.q_emb")
    s_vn2 = _NORM2_SQL.format(e="v.embedding")
    return f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS c_emb
      FROM {table}
      ORDER BY (vec_id::BIGINT * 2654435761) % 4294967296, vec_id
      LIMIT {nlist}),
    assigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT t.vec_id, t.embedding, c.centroid_id AS cell,
               row_number() OVER (
                 PARTITION BY t.vec_id
                 ORDER BY {a_dot} / (sqrt({a_tn2}) * sqrt({a_cn2})) DESC,
                          c.centroid_id ASC) AS rn
        FROM {table} t CROSS JOIN cent c)
      WHERE rn = 1),
    probes AS (
      SELECT query_id, q_emb, cell FROM (
        SELECT q.vec_id AS query_id, q.embedding AS q_emb,
               c.centroid_id AS cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {q_dot} / (sqrt({q_qn2}) * sqrt({a_cn2})) DESC,
                          c.centroid_id ASC) AS rn
        FROM {table} q CROSS JOIN cent c
        WHERE q.vec_id < {n_queries})
      WHERE rn <= {nprobe}),
    scored AS (
      SELECT p.query_id, v.vec_id AS neighbor_id,
             {s_dot} / (sqrt({s_qn2}) * sqrt({s_vn2})) AS cos
      FROM probes p JOIN assigned v ON v.cell = p.cell
      WHERE v.vec_id != p.query_id)
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS "rank"
    FROM scored
    QUALIFY "rank" <= {k}
    """


def lsh_ann_topk_sql(
    table: str = "embeddings", n_queries: int = 20, k: int = 5
) -> str:
    """Exact DuckDB oracle for lsh_ann_topk — possible because the whole
    plan is deterministic (signature = pure function of the embedding,
    multi-probe = fixed xor set, re-rank = IEEE-identical cosine)."""
    dot = _DOT_SQL.format(a="q.embedding", b="c.embedding")
    qn2 = _NORM2_SQL.format(e="q.embedding")
    cn2 = _NORM2_SQL.format(e="c.embedding")
    probes = ", ".join(
        ["q.sig"] + [f"xor(q.sig, {1 << p})" for p in range(N_PLANES)]
    )
    return f"""
    WITH sigs AS (
      SELECT vec_id, embedding, {lsh_signature_sql('embedding')} AS sig
      FROM {table}),
    probes AS (
      SELECT q.vec_id AS query_id, q.embedding, q.sig,
             unnest([{probes}]) AS bucket
      FROM sigs q WHERE q.vec_id < {n_queries}),
    scored AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
             {dot} / (sqrt({qn2}) * sqrt({cn2})) AS cos
      FROM probes q JOIN sigs c
        ON q.bucket = c.sig AND c.vec_id != q.query_id)
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS "rank"
    FROM scored
    QUALIFY "rank" <= {k}
    """
