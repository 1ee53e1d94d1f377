"""Streaming surfaces over the CONTENT stream — the fetched table's
commit log — complementing streaming/live.py's metrics tier.

The reference's stats daemon only watches counters; a training-data
pipeline also wants to watch the *corpus* as it accretes: capture
volume, revisit (dedupe) ratio, caption/token mass, image geometry.
Each crawl round appends one parquet file set to
``<warehouse>/fetched/data/<commit>/`` (catalog.py), so a file-stream
source sees exactly one micro-batch of new fetched rows per committed
round — the same tail-the-WAL shape as the metrics tier.

Scale notes:
  * the stream projects NARROW columns immediately — the payload
    ``bytes`` column never enters the streaming plan (column pruning
    reaches the parquet scan, the same payload discipline as the batch
    side);
  * ``host_content_totals`` keeps one state row per host (update
    mode); distinct-digest cardinality uses approx_count_distinct
    (HLL++), the only state-bounded way to track distincts forever;
  * ``round_content_windows`` is append-mode with a watermark on the
    round clock — finalized windows are emitted once and dropped from
    state, late fetched commits beyond the watermark are discarded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zeno_spark import schemas
from zeno_spark.streaming.live import ROUND_SECONDS

# narrow projection: everything the content surfaces need, no payloads
_NARROW = [
    "url", "host", "image_id", "w", "h", "fmt", "caption", "phash",
    "status", "type", "hop", "round", "payload_digest", "revisit",
]


def fetched_readstream(spark: SparkSession, warehouse: str) -> DataFrame:
    """File-stream source over the fetched table's append-only data
    files; one micro-batch per committed round.  Projects the narrow
    column set straight off the scan — payload bytes never enter the
    streaming plan."""
    path = os.path.join(warehouse, "fetched", "data", "*")
    return (
        spark.readStream.schema(schemas.FETCHED).parquet(path)
        .select(*_NARROW)
    )


def host_content_totals(fetched: DataFrame) -> DataFrame:
    """Running per-host corpus accounting (update mode, one state row
    per host): captures, revisit count (D8 dedupe pressure), distinct
    payload digests (approx — HLL keeps state bounded), caption token
    mass, decoded pixel mass."""
    tokens = F.when(
        F.col("caption").isNotNull(),
        F.size(F.split(F.col("caption"), " ")),
    ).otherwise(F.lit(0))
    pixels = F.coalesce(F.col("w") * F.col("h"), F.lit(0))
    return fetched.groupBy("host").agg(
        F.count(F.lit(1)).alias("captures"),
        F.sum(F.col("revisit").cast("long")).alias("revisits"),
        F.approx_count_distinct("payload_digest").alias("distinct_payloads"),
        F.sum(tokens.cast("long")).alias("caption_tokens"),
        F.sum(pixels.cast("long")).alias("pixels"),
        F.sum((F.col("fmt").isNotNull()).cast("long")).alias("images"),
    )


def round_content_windows(
    fetched: DataFrame,
    window_rounds: int = 2,
    slide_rounds: int = 1,
    late_rounds: int = 1,
) -> DataFrame:
    """Sliding content-volume windows over the round clock with a
    watermark (append mode): per window — captures, images, revisit
    ratio, mean caption tokens.  A fetched commit arriving more than
    ``late_rounds`` behind the newest round is dropped rather than
    reopening a finalized window."""
    ts = F.timestamp_seconds(F.col("round").cast("long") * ROUND_SECONDS)
    win = F.window(
        F.col("__ts"),
        f"{window_rounds * ROUND_SECONDS} seconds",
        f"{slide_rounds * ROUND_SECONDS} seconds",
    )
    tokens = F.when(
        F.col("caption").isNotNull(),
        F.size(F.split(F.col("caption"), " ")),
    ).otherwise(F.lit(0))
    return (
        fetched.withColumn("__ts", ts)
        .withWatermark("__ts", f"{late_rounds * ROUND_SECONDS} seconds")
        .groupBy(win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("captures"),
            F.sum((F.col("fmt").isNotNull()).cast("long")).alias("images"),
            F.sum(F.col("revisit").cast("long")).alias("revisits"),
            F.sum(tokens.cast("long")).alias("caption_tokens"),
        )
        .select(
            (F.col("win.start").cast("long") / ROUND_SECONDS)
            .cast("int").alias("round_start"),
            (F.col("win.end").cast("long") / ROUND_SECONDS)
            .cast("int").alias("round_end"),
            "captures", "images", "revisits", "caption_tokens",
            (F.col("revisits") / F.col("captures")).alias("revisit_ratio"),
        )
    )
