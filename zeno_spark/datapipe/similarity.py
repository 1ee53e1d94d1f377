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
COS_PAIR_TAU = 0.4  # near-dup threshold for this corpus (max cos ~0.51)

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0 as double), (acc, v) -> acc + v)"
)
_NORM2 = (
    "aggregate(transform({e}, x -> cast(x as double) * cast(x as double)), "
    "cast(0 as double), (acc, v) -> acc + v)"
)

_DOT_SQL = (
    "list_reduce(list_transform(generate_series(1, {dim}), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)
_NORM2_SQL = (
    "list_reduce(list_transform(generate_series(1, {dim}), "
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


def cosine_pairs(embeddings: DataFrame, tau: float = COS_PAIR_TAU) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= tau, vec_a < vec_b.
    Output: vec_a, vec_b (integers).

    This is the exactness baseline (block-nested pair scan); the scale
    path for all-pairs similarity is ``lsh_buckets`` + per-bucket exact
    verify, which prunes the quadratic candidate space first.
    """
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


def cosine_pairs_sql(table: str = "embeddings", tau: float = COS_PAIR_TAU) -> str:
    dot = _DOT_SQL.format(dim=DIM, a="a.embedding", b="b.embedding")
    na2 = _NORM2_SQL.format(dim=DIM, e="a.embedding")
    nb2 = _NORM2_SQL.format(dim=DIM, e="b.embedding")
    return f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
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
