"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship frontier-round pipeline shape; ``queries``
exposes every SQL-expressible operator from SURVEY.md §2 plus the
training-data pipeline tier (zeno_spark/datapipe); ``oracle_sql`` gives
the DuckDB equivalent for each (built from the same constants, see the
datapipe modules).  Non-SQL-expressible pieces (the stateful multi-round
crawl loop, checkpoint/resume, bloom prefilter identity, image decode)
are covered by tests/ — see tests/test_crawl.py oracle equivalence.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zeno_spark import queries as Q  # noqa: E402
from zeno_spark.datapipe import clusters as cl  # noqa: E402
from zeno_spark.datapipe import dedup as dd  # noqa: E402
from zeno_spark.datapipe import multimodal as mm  # noqa: E402
from zeno_spark.datapipe import select as sel  # noqa: E402
from zeno_spark.datapipe import similarity as sim  # noqa: E402
from zeno_spark.datapipe import text as tx  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl-round pipeline shape over the events frontier
    analogue — admission gates (F1-F5) -> in-batch keep-first dedupe (D6)
    -> seen-set anti-join (D1) -> per-key FIFO politeness window (O2-O4).
    All native columns; the same composition plans/crawl.py runs per
    round over the real frontier."""
    from pyspark.sql import Window

    events = spark.read.parquet(f"{_SF0001}/events.parquet")
    admitted = events.filter(
        F.col("event_type").isin("click", "view")
        & ~F.col("user_id").isin(*Q.EXCLUDED_USERS)
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    batch = (
        admitted.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # seen-set anti-join on the ITEM key (the url_hash analogue): items
    # with value < 5 play the role of already-crawled URLs
    seen = events.filter(F.col("value") < 5).select("event_id").distinct()
    new = batch.join(seen, "event_id", "left_anti")
    w_sched = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        new.withColumn("sched_rank", F.row_number().over(w_sched))
        .filter(F.col("sched_rank") <= Q.SCHEDULE_BUDGET)
        .select("user_id", "event_id", "event_type", "sched_rank")
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # crawl operator shapes (SURVEY §2.2-2.4, §2.8)
        "schedule_window": Q.q_schedule_window,
        "seen_antijoin": Q.q_seen_antijoin,
        "inbatch_first": Q.q_inbatch_first,
        "admission_filter": Q.q_admission_filter,
        "host_counts": Q.q_host_counts,
        "top_hosts": Q.q_top_hosts,
        "rolling_rate": Q.q_rolling_rate,
        "payload_revisit": Q.q_payload_revisit,
        # D8 remote tier: local->CDX dedupe composition (cross-crawl
        # revisits carrying WARC-Refers-To-* against a prior archive)
        "cdx_revisit": Q.q_cdx_revisit,
        # S6 adjunct: wayback-style capture resolution (the CDX lookup
        # WarcReplayTransport fetches through — latest capture, revisit
        # payload stitch, unresolvable drop)
        "cdx_resolve": Q.q_cdx_resolve,
        # adaptive-politeness AIMD fold (streaming/politeness.py) — the
        # custom stateful operator's batch-replay form, oracle'd by a
        # recursive CTE applying the identical per-host transition
        "aimd_budgets": Q.q_aimd_budgets,
        # host link-graph analytics (datapipe/graph.py) — degrees +
        # fixed-point integer PageRank (engine-exact by construction)
        "host_degrees": Q.q_host_degrees,
        "host_pagerank": Q.q_host_pagerank,
        # analytics over the star schema
        "pricing_summary": Q.q_pricing_summary,
        "revenue_topk": Q.q_revenue_topk,
        "region_rollup": Q.q_region_rollup,
        # text analysis tier (datapipe/text.py)
        "doc_token_stats": lambda s, d: tx.token_stats(_docs(s, d)),
        "doc_quality": lambda s, d: tx.quality(_docs(s, d)),
        "doc_langid": lambda s, d: tx.langid(_docs(s, d)),
        "doc_fingerprint": lambda s, d: tx.fingerprint(_docs(s, d)),
        # dedup tier (datapipe/dedup.py)
        "dedup_exact": lambda s, d: dd.exact_dedup(_docs(s, d)),
        "dedup_jaccard": lambda s, d: dd.jaccard_pairs(_docs(s, d)),
        "doc_minhash": lambda s, d: dd.minhash_signatures(_docs(s, d)),
        "dedup_minhash_lsh": lambda s, d: dd.minhash_lsh_pairs(_docs(s, d)),
        "doc_simhash": lambda s, d: dd.simhash(_docs(s, d)),
        "dedup_clusters": lambda s, d: cl.dedup_clusters(_docs(s, d)),
        "dedup_simhash": lambda s, d: dd.simhash_pairs(_docs(s, d)),
        # crawl-sink perceptual dedupe (phash_near_dup_marks) over a
        # deterministic 64-bit key derived from the docs' simhash
        "phash_near_dup": lambda s, d: mm.phash_marks_over_docs(_docs(s, d)),
        # corpus-selection capstone (datapipe/select.py): quality +
        # langid + near-dup keep-marks + deterministic fingerprint
        # sample composed into the selected training corpus
        "corpus_select": lambda s, d: sel.corpus_select(_docs(s, d)),
        # similarity tier (datapipe/similarity.py)
        "ann_cosine_topk": lambda s, d: sim.cosine_topk(_embs(s, d)),
        "dedup_embedding": lambda s, d: sim.cosine_pairs(_embs(s, d)),
        "embedding_clusters": lambda s, d: cl.embedding_clusters(_embs(s, d)),
        "ann_lsh_topk": lambda s, d: sim.lsh_ann_topk(_embs(s, d)),
        "ann_ivf_topk": lambda s, d: sim.ivf_topk(_embs(s, d)),
        # the PRODUCTION IVF path: build the cell-partitioned index on
        # disk, then probe it with partition pruning.  Results are
        # identical to ann_ivf_topk by construction (same centroid /
        # assignment / probe expressions), so it shares the exact
        # oracle — the driver gate covers build+probe end to end.
        "ann_ivf_indexed": _ann_ivf_indexed,
    }


def _ann_ivf_indexed(s, d):
    import tempfile

    from pyspark.sql import functions as F

    path = tempfile.mkdtemp(prefix="zeno_ivf_") + "/index"
    embs = _embs(s, d)
    sim.build_ivf_index(embs, path)
    queries = embs.filter(F.col("vec_id") < 20)
    return sim.ivf_topk_indexed(s, path, queries)


def oracle_sql() -> dict[str, str]:
    return {
        "schedule_window": Q.q_schedule_window_sql(),
        "seen_antijoin": Q.q_seen_antijoin_sql(),
        "inbatch_first": Q.q_inbatch_first_sql(),
        "admission_filter": Q.q_admission_filter_sql(),
        "host_counts": Q.q_host_counts_sql(),
        "top_hosts": Q.q_top_hosts_sql(),
        "rolling_rate": Q.q_rolling_rate_sql(),
        "payload_revisit": Q.q_payload_revisit_sql(),
        "cdx_revisit": Q.q_cdx_revisit_sql(),
        "cdx_resolve": Q.q_cdx_resolve_sql(),
        "aimd_budgets": Q.q_aimd_budgets_sql(),
        "host_degrees": Q.q_host_degrees_sql(),
        "host_pagerank": Q.q_host_pagerank_sql(),
        "pricing_summary": Q.q_pricing_summary_sql(),
        "revenue_topk": Q.q_revenue_topk_sql(),
        "region_rollup": Q.q_region_rollup_sql(),
        "doc_token_stats": tx.token_stats_sql(),
        "doc_quality": tx.quality_sql(),
        "doc_langid": tx.langid_sql(),
        "doc_fingerprint": tx.fingerprint_sql(),
        "dedup_exact": dd.exact_dedup_sql(),
        "dedup_jaccard": dd.jaccard_pairs_sql(),
        "doc_minhash": dd.minhash_signatures_sql(),
        "dedup_minhash_lsh": dd.minhash_lsh_pairs_sql(),
        "doc_simhash": dd.simhash_sql(),
        "dedup_clusters": cl.dedup_clusters_sql(),
        "dedup_simhash": dd.simhash_pairs_sql(),
        "phash_near_dup": mm.phash_marks_sql(),
        "corpus_select": sel.corpus_select_sql(),
        "ann_cosine_topk": sim.cosine_topk_sql(),
        "dedup_embedding": sim.cosine_pairs_sql(),
        "embedding_clusters": cl.embedding_clusters_sql(),
        # deterministic plan (signature/probes/re-rank are pure
        # expressions), so an exact oracle exists despite "ANN"
        "ann_lsh_topk": sim.lsh_ann_topk_sql(),
        # IVF coarse-quantizer tier: centroid pick / assignment / probe
        # are pure expressions too -> exact oracle
        "ann_ivf_topk": sim.ivf_topk_sql(),
        "ann_ivf_indexed": sim.ivf_topk_sql(),
    }
