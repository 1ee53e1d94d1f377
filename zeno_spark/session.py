"""SparkSession factory.

Local-mode testing stands in for the multi-executor cluster of the north
rule; the configs below are the same ones a 1000-executor deployment
would set (AQE, skew-join handling, Arrow batch sizing).  At cluster
scale the only changes are master/resource flags on spark-submit — no
code here assumes a single JVM.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "zeno_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    aqe: bool = True,
) -> SparkSession:
    """``aqe``: adaptive query execution.  Keep it ON for ad-hoc analytics
    (skew-join splitting, partition coalescing pay off on real data
    volumes).  The crawl-round driver turns it OFF: measured on the bench
    corpus (100k pages, 2 rounds, local[32] vs local[8]), AQE's
    per-shuffle re-planning adds ~1s latency x ~20 query stages per round
    and scales WITH partition count — 251 pages/s (AQE on) vs 494 (off)
    at 32 cores; skew is already handled explicitly by salted politeness
    windows (operators/schedule.py), so AQE's skew-join adds nothing the
    crawl plan needs at round granularity."""
    cores = cores or DEFAULT_CPUS
    # Shuffle parallelism ~ cores locally; on a real cluster this scales to
    # 2-3x total executor cores and AQE coalesces the rest.
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = SparkSession.builder
    # Under spark-submit (PYSPARK_GATEWAY_PORT set: the JVM gateway already
    # exists with --master/--deploy-mode resolved) the submit flags own the
    # master and resources — setting .master() here would silently override
    # `spark-submit --master yarn` back to local mode.  Only force a local
    # master when this process launched the JVM itself (pytest, bench.py).
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true" if aqe else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2048 keeps pandas-UDF batches bounded even with ~100 KB binary
        # payload columns (10k-row batches of such rows are ~1 GB frames)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # broadcast small dims (seen-partition blooms, robots cache, host
        # exclusion lists) aggressively; 64 MB is safe at 128 GiB driver
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("ZENO_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
