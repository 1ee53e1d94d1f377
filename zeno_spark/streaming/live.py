"""A2/A4 live stats as Structured Streaming — the reference's stats
daemon and Prometheus exporter (crawl/api.go:34-110, crawl/stats.go:38,
1 s rate window at crawl/config.go:185) re-expressed as incremental
streams over the metrics table instead of an in-process goroutine.

The batch engine appends one parquet file set per round to
``<warehouse>/metrics/data/<commit>/`` (catalog.py); a file-stream
source over ``data/*`` therefore sees exactly one micro-batch of new
rows per committed round — the streaming analogue of tailing the WAL.
A monitoring process runs these queries INDEPENDENTLY of the crawl
driver (on a cluster: a second tiny always-on job), which is precisely
how the reference separates its API goroutine from the workers.

Event time is the ROUND CLOCK: the batch engine is synchronous-BSP, so
`round` is the only meaningful time axis; it maps to a timestamp via
``ROUND_SECONDS`` purely so Spark's event-time machinery (windows +
watermark) applies.  Late data is real here: a straggling/retried
metrics commit from round r can land after round r+1's files — the
watermark bounds how long window state waits for it, exactly the
late-data contract a production metrics pipeline needs.

State-size notes (100 TB / long crawls): `host_totals` keeps one state
row per host (update mode, no watermark — counters are monotone and
never finalize); `round_rates` keeps only the windows newer than the
watermark (append mode — finalized windows are emitted once and
dropped from state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zeno_spark import schemas

# one crawl round == one tick of the logical clock, scaled to seconds
# only because event-time APIs want timestamps
ROUND_SECONDS = 60

_COUNTERS = [
    "scheduled", "fetched_ok", "fetched_err", "redirects",
    "retries", "discovered", "new_after_dedup",
]


def metrics_readstream(spark: SparkSession, warehouse: str) -> DataFrame:
    """File-stream source over the metrics table's append-only data
    files (one directory per snapshot commit -> one micro-batch per
    round)."""
    path = os.path.join(warehouse, "metrics", "data", "*")
    return spark.readStream.schema(schemas.METRICS).parquet(path)


def host_totals(metrics: DataFrame) -> DataFrame:
    """Running per-host counter totals — the `/metrics` Prometheus
    counter surface (api.go:92-110: `downloaded_uri_count_total`
    labelled by host).  Update-mode stateful aggregation; state is one
    row per host."""
    return metrics.groupBy("host").agg(
        *[F.sum(c).alias(c) for c in _COUNTERS]
    )


def round_rates(
    metrics: DataFrame,
    window_rounds: int = 2,
    slide_rounds: int = 1,
    late_rounds: int = 1,
) -> DataFrame:
    """Sliding fetch-rate windows over the round clock (the `/` rate
    gauge, api.go:36-53 / stats.go:38) with a watermark: a metrics
    commit arriving more than ``late_rounds`` behind the newest round
    is dropped instead of reopening finalized windows.  Append mode —
    each window is emitted exactly once, when the watermark passes its
    end.  Output: round_start, round_end (inclusive/exclusive round
    indexes), summed counters, pages_per_round."""
    ts = F.timestamp_seconds(F.col("round").cast("long") * ROUND_SECONDS)
    win = F.window(
        F.col("__ts"),
        f"{window_rounds * ROUND_SECONDS} seconds",
        f"{slide_rounds * ROUND_SECONDS} seconds",
    )
    return (
        metrics.withColumn("__ts", ts)
        .withWatermark("__ts", f"{late_rounds * ROUND_SECONDS} seconds")
        .groupBy(win.alias("win"))
        .agg(*[F.sum(c).alias(c) for c in _COUNTERS])
        .select(
            (F.col("win.start").cast("long") / ROUND_SECONDS)
            .cast("int")
            .alias("round_start"),
            (F.col("win.end").cast("long") / ROUND_SECONDS)
            .cast("int")
            .alias("round_end"),
            *_COUNTERS,
            (F.col("fetched_ok") / F.lit(window_rounds)).alias(
                "pages_per_round"
            ),
        )
    )


def run_available_now(
    df: DataFrame, checkpoint: str, output_mode: str, sink=None
) -> list:
    """Drain everything currently unprocessed through ``sink(batch_df,
    batch_id)`` and stop.  The checkpoint carries source offsets +
    aggregation state across invocations, so successive calls are
    incremental and exactly-once (foreachBatch is the checkpoint-
    recoverable sink; the memory sink is not).  Default sink collects
    the emitted rows and returns them — the right shape for tests and
    for a monitoring loop pushing tiny aggregates to a gauge; a
    deployment passes its own sink (or .start()s unbounded)."""
    out: list = []

    def _collect(batch_df: DataFrame, _batch_id: int) -> None:
        out.extend(batch_df.collect())

    q = (
        df.writeStream.foreachBatch(sink or _collect)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out
