"""Host link-graph analytics over the crawl's discovery edges.

Addition beyond the reference: Zeno keeps only per-host scalar COUNTS
(`internal/pkg/queue/stats.go:112-143` elementsPerHost) — it never
materializes the link structure its outlink extraction walks.  At
archive scale the host-level link graph IS the canonical derived
dataset of a crawl (hub discovery, seed-list curation, spam/host-farm
triage, crawl-frontier prioritization), so this module turns the
frontier's (parent_url -> url) discovery rows into an aggregated
host graph and runs the two standard analyses on it:

  * ``host_link_edges``  — (src_host, dst_host, weight) aggregation;
  * ``degrees``          — in/out degree per node (exact integers);
  * ``pagerank``         — K-iteration PageRank, FIXED-POINT INTEGER.

Determinism discipline (the reason this tier can sit in the exact
driver oracle gate): PageRank here runs entirely in integer
arithmetic — ranks are bigint micro-units (``PR_SCALE`` = 1.0),
damping is an integer percentage, per-edge contributions use integer
division.  Integer addition is exactly associative and commutative,
so the result is bit-identical under any aggregation order, any
partitioning, any engine; a float PageRank would drift in the last
ulps between Spark's and DuckDB's shuffle/aggregate orders and could
never be hash-compared.  The DuckDB oracle (``pagerank_sql``) unrolls
the identical K iterations as chained CTEs — same base mass, same
floor divisions — and the driver gate compares hash-exact.

Semantics notes:
  * edges are DISTINCT (src, dst) for the rank walk (a page linking a
    host five times is one endorsement); ``weight`` is kept by
    ``host_link_edges`` for degree/traffic analyses only;
  * dangling nodes (no out-edges) drop their damped mass — the
    standard "dangling mass removed" simplification (the (1-d) base
    term keeps every node's rank positive); ranks are therefore a
    relative ordering, not a probability simplex;
  * self-loops are kept as-is (a host linking itself is real signal
    in host graphs; callers can filter ``src != dst`` upstream).

Scale notes (100 TB): the iteration state is one (node, rank) bigint
pair per HOST — orders of magnitude smaller than the frontier; each
round is one equi-join edges×ranks + one sum-aggregate, shuffling
(long, long) rows only.  Lineage is truncated every round with an
eager localCheckpoint exactly as datapipe/clusters.py does (on a real
cluster: reliable checkpointing).  Edges and out-degrees are
materialized once, outside the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ITERS = 5
PR_DAMPING_PCT = 85       # d = 0.85 as an integer percentage
PR_SCALE = 1_000_000      # bigint micro-units: 1_000_000 == rank 1.0


def host_link_edges(frontier: DataFrame) -> DataFrame:
    """Aggregate the frontier's discovery rows (parent_url -> url)
    into host-level edges (src_host, dst_host, weight).

    Seeds (null/empty parent_url) carry no discovery edge and are
    dropped.  The dst host is the frontier's own ``host`` column (the
    politeness partition key, schemas.py); the src host is extracted
    from parent_url with the same vectorized helper the extract stage
    uses (functions/urls.py host_udf) — one Arrow pass, no per-row
    Python."""
    from zeno_spark.functions.urls import host_udf

    return (
        frontier
        .filter(F.col("parent_url").isNotNull() & (F.col("parent_url") != ""))
        .select(
            host_udf(F.col("parent_url")).alias("src_host"),
            F.col("host").alias("dst_host"),
        )
        .filter(F.col("src_host").isNotNull() & (F.col("src_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Exact in/out degrees per node over DISTINCT (src, dst) edges.

    Input cols ``src``, ``dst``; output (node, out_deg, in_deg) with
    every endpoint present and absent sides as 0 — all bigint, so the
    oracle compare is exact."""
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        nodes.join(out_d, "node", "left")
        .join(in_d, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping_pct: int = PR_DAMPING_PCT,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-point integer PageRank over DISTINCT (src, dst) edges.

    Returns (node, rank_micro) for every edge endpoint after exactly
    ``iters`` synchronous iterations:

        rank_0(v)   = scale
        contrib(u->v) = ((rank(u) * damping_pct) div 100) div out_deg(u)
        rank_k(v)   = base + sum over in-edges of contrib
        base        = (scale * (100 - damping_pct)) div 100

    All arithmetic is bigint with floor division on non-negative
    values, so the fixpoint is schedule- and engine-independent
    (module docstring); ``pagerank_sql`` is the unrolled DuckDB
    mirror."""
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # out-degrees attach to the edge list once, outside the loop
    e = (
        e.join(
            e.groupBy("src").agg(F.count("*").alias("out_deg")), "src"
        )
        .localCheckpoint(eager=True)
    )
    base = (scale * (100 - damping_pct)) // 100
    contrib_expr = F.expr(
        f"((rank * {int(damping_pct)}) div 100) div out_deg"
    )
    ranks = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(int(iters)):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), contrib_expr.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(int(base)) + F.coalesce(F.col("c"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("rank").alias("rank_micro"))


def pagerank_sql(
    edges_sql: str,
    iters: int = PR_ITERS,
    damping_pct: int = PR_DAMPING_PCT,
    scale: int = PR_SCALE,
) -> str:
    """The DuckDB mirror of ``pagerank``: the same K iterations
    unrolled as chained CTEs over ``edges_sql`` (any SELECT yielding
    src, dst).  ``//`` is DuckDB's integer floor division — identical
    to Spark's ``div`` on the non-negative bigints used here; sums
    are cast back to BIGINT (DuckDB widens SUM(BIGINT) to HUGEINT)."""
    base = (scale * (100 - damping_pct)) // 100
    parts = [
        f"WITH __raw AS ({edges_sql})",
        "__edges AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,"
        " CAST(dst AS BIGINT) AS dst FROM __raw)",
        "__nodes AS (SELECT src AS node FROM __edges"
        " UNION SELECT dst FROM __edges)",
        "__outd AS (SELECT src, count(*) AS out_deg FROM __edges"
        " GROUP BY src)",
        f"__r0 AS (SELECT node, CAST({int(scale)} AS BIGINT) AS rank"
        " FROM __nodes)",
    ]
    for k in range(1, int(iters) + 1):
        parts.append(
            f"__r{k} AS (SELECT n.node, CAST({int(base)} +"
            " COALESCE(c.s, 0) AS BIGINT) AS rank"
            " FROM __nodes n LEFT JOIN ("
            "SELECT e.dst AS node,"
            f" SUM(((r.rank * {int(damping_pct)}) // 100) // o.out_deg)"
            " AS s"
            f" FROM __edges e JOIN __outd o ON o.src = e.src"
            f" JOIN __r{k - 1} r ON r.node = e.src"
            " GROUP BY e.dst) c ON c.node = n.node)"
        )
    head = ",\n".join(parts)
    return (
        f"{head}\n"
        f"SELECT node, rank AS rank_micro FROM __r{int(iters)}"
    )


def degrees_sql(edges_sql: str) -> str:
    """DuckDB mirror of ``degrees`` over ``edges_sql`` (src, dst)."""
    return f"""
    WITH __raw AS ({edges_sql}),
    __edges AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,
                                CAST(dst AS BIGINT) AS dst FROM __raw),
    __nodes AS (SELECT src AS node FROM __edges
                UNION SELECT dst FROM __edges)
    SELECT n.node,
           CAST(COALESCE(o.c, 0) AS BIGINT) AS out_deg,
           CAST(COALESCE(i.c, 0) AS BIGINT) AS in_deg
    FROM __nodes n
    LEFT JOIN (SELECT src, count(*) AS c FROM __edges GROUP BY src) o
           ON o.src = n.node
    LEFT JOIN (SELECT dst, count(*) AS c FROM __edges GROUP BY dst) i
           ON i.dst = n.node
    """
