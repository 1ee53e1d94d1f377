"""Near-duplicate CLUSTER RESOLUTION — the last stage of a real dedup
pipeline.  Pair operators (jaccard/minhash-LSH/simhash/embedding) emit
edges; a production corpus-dedup must resolve those edges into
connected components and elect one canonical survivor per component,
because near-duplication is not transitive pair-by-pair: A~B and B~C
must collapse to ONE kept document even when A~C was never proposed.

Spark-first design: iterative hash-min label propagation with pointer
jumping (label(v) <- min over {label(v), labels of v's graph
neighbors, label(label(v))}).  Labels are component-min doc_ids, so
the fixpoint is schedule-independent and deterministic.  The pointer-
jump term gives path-halving: convergence in O(log diameter) rounds
instead of O(diameter) — the MapReduce-CC family of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC'14); each round
is two narrow equi-joins + a min-aggregate shuffling only (long, long)
rows, never document bodies.

Scale notes (100 TB):
  * the iteration state is one (node, label) row per document — 16
    bytes/doc, independent of text size; edges are the pair operator's
    output (already pruned by LSH/pigeonhole);
  * lineage is truncated every round with an eager localCheckpoint
    (the per-round plan would otherwise double); on a real cluster use
    reliable checkpointing to survive executor loss mid-iteration;
  * round count is O(log max-component-diameter) — near-dup clusters
    are dense (diameter 2-3 typical), so 3-5 rounds in practice; the
    max_iter guard turns a pathological input into a loud error, not
    an infinite driver loop.

The DuckDB oracle computes the same fixpoint declaratively (recursive
CTE propagating seed labels along symmetrized edges; min per node =
component min) — a different evaluation strategy for the identical
closure, which is exactly what the driver gate should compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zeno_spark.datapipe.dedup import simhash_pairs, simhash_pairs_sql

CC_MAX_ITER = 30


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = CC_MAX_ITER
) -> DataFrame:
    """Connected components over ``edges`` (cols ``src``, ``dst``,
    treated as undirected) covering every row of ``nodes`` (col
    ``node``; isolated nodes become singleton components).  Returns
    (node, cluster_id) where cluster_id is the component's minimum
    node id — deterministic, schedule-independent.

    Hash-min with pointer jumping; labels only ever decrease, so the
    emptiness of the changed-set is an exact convergence witness."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # edges re-enter the join every round: keep them materialized once
    sym = sym.localCheckpoint(eager=True)
    labels = nodes.select("node", F.col("node").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "label")
        )
        jump = (
            labels.alias("x")
            .join(
                labels.select(
                    F.col("node").alias("label"),
                    F.col("label").alias("__l2"),
                ),
                "label",
            )
            .select("node", F.col("__l2").alias("label"))
        )
        new = (
            labels.union(nbr).union(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new = new.localCheckpoint(eager=True)
        converged = (
            new.join(labels.withColumnRenamed("label", "__old"), "node")
            .filter(F.col("label") < F.col("__old"))
            .isEmpty()
        )
        labels = new
        if converged:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    docs: DataFrame, text_col: str = "text", max_iter: int = CC_MAX_ITER
) -> DataFrame:
    """Resolve the simhash near-dup pair graph (pigeonhole block join,
    dedup.simhash_pairs) into components and elect survivors.  Output
    one row per document: doc_id, cluster_id (component-min doc_id),
    cluster_size, keep (1 for the canonical survivor, else 0).
    Documents with no near-dup edge are their own singleton cluster
    (keep=1) — the operator's output is a total keep/drop decision for
    the corpus, ready to semi-join against the documents table."""
    pairs = simhash_pairs(docs, text_col).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    cc = connected_components(nodes, pairs, max_iter)
    sized = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        cc.join(sized, "cluster_id")
        .select(
            F.col("node").alias("doc_id"),
            "cluster_id",
            "cluster_size",
            F.when(F.col("node") == F.col("cluster_id"), 1)
            .otherwise(0)
            .cast("int")
            .alias("keep"),
        )
    )


def embedding_clusters(
    embeddings: DataFrame, max_iter: int = CC_MAX_ITER
) -> DataFrame:
    """The same pairs→clusters→survivors resolution over the EMBEDDING
    near-dup graph (similarity.cosine_pairs: banded sign-LSH candidates
    + exact-cosine verify).  One row per vector: vec_id, cluster_id,
    cluster_size, keep — the keep/drop decision an embedding-dedup
    pipeline semi-joins back against the corpus."""
    from zeno_spark.datapipe.similarity import cosine_pairs

    pairs = cosine_pairs(embeddings).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    nodes = embeddings.select(F.col("vec_id").alias("node"))
    cc = connected_components(nodes, pairs, max_iter)
    sized = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        cc.join(sized, "cluster_id")
        .select(
            F.col("node").alias("vec_id"),
            "cluster_id",
            "cluster_size",
            F.when(F.col("node") == F.col("cluster_id"), 1)
            .otherwise(0)
            .cast("int")
            .alias("keep"),
        )
    )


def embedding_clusters_sql(table: str = "embeddings") -> str:
    """DuckDB oracle: recursive-CTE closure over the banded-cosine pair
    oracle (similarity.cosine_pairs_sql — the same candidate + verify
    semantics declaratively)."""
    from zeno_spark.datapipe.similarity import cosine_pairs_sql

    return f"""
    WITH RECURSIVE
    pairs AS ({cosine_pairs_sql(table)}),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM pairs
      UNION ALL
      SELECT vec_b AS src, vec_a AS dst FROM pairs),
    reach(node, label) AS (
      SELECT vec_id, vec_id FROM {table}
      UNION
      SELECT e.dst, r.label
      FROM reach r JOIN edges e ON e.src = r.node),
    cc AS (
      SELECT node AS vec_id, min(label) AS cluster_id
      FROM reach GROUP BY node),
    sized AS (
      SELECT cluster_id, count(*) AS cluster_size
      FROM cc GROUP BY cluster_id)
    SELECT cc.vec_id, cc.cluster_id, sized.cluster_size,
           (CASE WHEN cc.vec_id = cc.cluster_id THEN 1 ELSE 0 END)::INTEGER
             AS keep
    FROM cc JOIN sized USING (cluster_id)
    """


def dedup_clusters_sql(table: str = "documents") -> str:
    """DuckDB oracle: the same closure as a recursive CTE.  Seeds every
    doc with its own id and propagates labels along symmetrized edges;
    UNION-dedup bounds the fact space (node x reachable-seed) so the
    fixpoint terminates; min(label) per node is the component min."""
    return f"""
    WITH RECURSIVE
    pairs AS ({simhash_pairs_sql(table)}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM {table}
      UNION
      SELECT e.dst, r.label
      FROM reach r JOIN edges e ON e.src = r.node),
    cc AS (
      SELECT node AS doc_id, min(label) AS cluster_id
      FROM reach GROUP BY node),
    sized AS (
      SELECT cluster_id, count(*) AS cluster_size
      FROM cc GROUP BY cluster_id)
    SELECT cc.doc_id, cc.cluster_id, sized.cluster_size,
           (CASE WHEN cc.doc_id = cc.cluster_id THEN 1 ELSE 0 END)::INTEGER
             AS keep
    FROM cc JOIN sized USING (cluster_id)
    """
