"""Politeness scheduling, O1-O5 (SURVEY §2.4).

The reference interleaves hosts round-robin (one item per host per turn,
hosts in first-seen order, FIFO within host — queue/dequeue.go:135-158 +
index/index.go:49-90) and *intends* a per-host concurrency cap of 16
(--max-concurrent-per-domain, cmd/get.go:53; the enforcement is dead
code, crawl/utils.go:81-84).

Batch equivalent: one crawl round takes the first `per_host_budget` items
of every host, FIFO by enqueue_seq:

    row_number() OVER (PARTITION BY host ORDER BY enqueue_seq) <= budget

which is exactly k turns of Zeno's round-robin for every host, and an
*exact* enforcement of the per-domain cap the reference never wired up.

Skew (the north rule's hot-host concern): a wide-crawl frontier is
zipf-distributed, so PARTITION BY host alone puts a hot host's millions
of pending rows through one window task.  Two-phase top-k fixes it:

  phase 1: rank within (host, salt) where salt = url_hash % buckets —
           parallel across buckets, keeps <= budget rows per salt bucket
  phase 2: exact rank within host over the <= budget*buckets survivors

Phase 2's input is tiny (budget*buckets rows/host), so the exact window
is cheap; results are identical to the unsalted window because FIFO rank
within host only needs the global smallest `budget` enqueue_seqs, and
every one of them survives its salt bucket's local top-`budget`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zeno_spark.config import CrawlConfig


def schedulable(frontier: DataFrame, round_no: int) -> DataFrame:
    """Rows eligible this round: retry backoff gate (O5) — pushed down to
    the frontier scan as a native predicate."""
    return frontier.filter(F.col("not_before_round") <= F.lit(round_no))


def politeness_schedule(
    frontier: DataFrame,
    cfg: CrawlConfig,
    delays: DataFrame | None = None,
    budgets: DataFrame | None = None,
) -> DataFrame:
    """Pick this round's fetch set: per-host FIFO top-`per_host_budget`.

    ``delays`` (optional) is a tiny (host, crawl_delay) frame — the
    robots cache — mapping a host's Crawl-delay to a SHRUNK per-round
    budget: one round models ``cfg.round_seconds`` of wall clock (the
    same logical clock streaming/live.py uses), so a host asking for
    d-second spacing gets min(budget, max(1, floor(round_seconds/d)))
    fetches per round.  The reference has no delay enforcement at all
    (SURVEY §2.10); this is the F10-adjacent politeness tier the robots
    column exists for.  Broadcast join — the delay side is one row per
    host with a delay.

    ``budgets`` (optional) is a tiny (host, budget) frame of PER-HOST
    budget overrides — the AIMD adaptive-politeness recommendations
    (streaming/politeness.py) fed back into the scheduler: hosts that
    served 429s/conn-failures get a halved quota next round, clean
    hosts grow back additively.  Overrides may exceed the base budget,
    so the salt-phase bound is the per-row effective budget (keeping
    phase 1 a superset per host, which is what keeps the salted plan
    exact).  A delay shrink applies ON TOP of the override (robots
    always wins).  Broadcast join — one row per recommended host."""
    budget = cfg.per_host_budget
    # within-host order: FIFO (the local queue, index/index.go:82-90) or
    # LIFO (the HQ feed's default strategy, cmd/get_hq.go:55 /
    # hq.go:180).  Both phases below MUST share the order: phase 1's
    # per-salt-bucket top-k is a superset of the per-host top-k under
    # any fixed total order, which is what keeps the salted plan exact.
    seq = (
        F.col("enqueue_seq").asc()
        if cfg.schedule_strategy != "lifo"
        else F.col("enqueue_seq").desc()
    )
    # priority tier first (north rule: politeness PRIORITY queue —
    # higher priority pops earlier within its host), then the strategy
    # order, then the hash tiebreak for full determinism
    order = [F.col("priority").desc(), seq, F.col("url_hash").asc()]
    df = frontier
    if budgets is not None:
        ov = F.broadcast(
            budgets.select(
                F.col("host").alias("__b_host"),
                F.col("budget").alias("__b_budget"),
            )
        )
        df = df.join(ov, df["host"] == F.col("__b_host"), "left")
    eff_budget = (
        F.coalesce(F.col("__b_budget"), F.lit(budget))
        if budgets is not None
        else F.lit(budget)
    )
    if cfg.host_salt_buckets > 1:
        # phase 1 — salted local top-k (kills the hot-host single-task
        # window).  Uses the full EFFECTIVE budget: a delay only
        # shrinks a host's final quota, so phase 1's survivors stay a
        # superset.
        salt = F.pmod(F.col("url_hash"), F.lit(cfg.host_salt_buckets))
        w1 = Window.partitionBy("host", salt).orderBy(*order)
        df = (
            df.withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= eff_budget)
            .drop("__r1")
        )
    budget_col = eff_budget
    if delays is not None:
        d = F.broadcast(
            delays.filter(F.col("crawl_delay").isNotNull())
            .select(
                F.col("host").alias("__d_host"),
                F.col("crawl_delay").alias("__delay"),
            )
        )
        df = df.join(d, df["host"] == F.col("__d_host"), "left")
        budget_col = F.when(
            F.col("__delay").isNotNull() & (F.col("__delay") > 0),
            F.least(
                eff_budget,
                F.greatest(
                    F.lit(1),
                    F.floor(F.lit(float(cfg.round_seconds)) / F.col("__delay")),
                ),
            ),
        ).otherwise(eff_budget)
    # phase 2 — exact per-host FIFO rank (O2+O3+O4)
    w2 = Window.partitionBy("host").orderBy(*order)
    out = (
        df.withColumn("__rank", F.row_number().over(w2))
        .filter(F.col("__rank") <= budget_col)
        .drop("__rank")
    )
    if delays is not None:
        out = out.drop("__d_host", "__delay")
    if budgets is not None:
        out = out.drop("__b_host", "__b_budget")
    return out


def backoff_retry_rows(failed: DataFrame, round_no: int, cfg: CrawlConfig) -> DataFrame:
    """O5 — 429 rows re-enter the frontier with retry+1 and a linear
    backoff (`retry*2s` sleep in the reference, capture.go:84-114, mapped
    to `retry * retry_backoff_rounds` rounds).  Retries bypass the
    seencheck (capture.go:319-330 sets BypassSeencheck on sendback)."""
    return (
        failed.filter(F.col("retry") + 1 <= F.lit(cfg.max_retry))
        .withColumn("retry", F.col("retry") + 1)
        .withColumn("bypass_seencheck", F.lit(True))
        .withColumn(
            "not_before_round",
            F.lit(round_no + 1) + F.col("retry") * F.lit(cfg.retry_backoff_rounds),
        )
    )
