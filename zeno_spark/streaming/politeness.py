"""Adaptive per-host politeness controller — a CUSTOM STATEFUL
streaming operator (applyInPandasWithState) over the metrics stream.

The reference adjusts fetch pressure per host reactively: 429s push
items into backoff and the per-host queue drains slower
(crawl/capture.go:56-114's MaxRetry/backoff discipline).  The batch
engine mirrors that with `not_before_round` (operators/schedule.py).
This operator is the MONITORING-SIDE generalization: an AIMD
(additive-increase / multiplicative-decrease — the TCP congestion
rule) controller that watches each host's per-round error mix in the
streaming metrics feed and emits a recommended `per_host_budget` for
the next rounds, plus an error-rate EWMA.

Why applyInPandasWithState and not a windowed aggregate: the budget
transition is RECURSIVE — round r's recommendation depends on the
recommendation after round r-1 (halving compounds), which no
associative/windowed aggregation expresses.  Arbitrary keyed state +
per-group transition code is exactly the applyInPandasWithState
contract, and the state (4 numbers per host) is Arrow-batched, never
row-at-a-time Python.

State per host: (budget, ewma_err, last_round) — 24 B.  At 10^8 hosts
that is ~2.4 GB of state spread across executors: fine, and the
update-mode sink emits one row per (host, round) actually observed.

Control law per observed round, in round order:
  hard_err = max(0, fetched_err - redirects - retries)
  err_rate = (hard_err + retries) / scheduled          (0 if idle)
  ewma     = (1-ALPHA)*ewma + ALPHA*err_rate
  retries > 0 (429/conn-fail pressure)   -> budget = max(min, budget // 2)
  else ewma < EWMA_OK and hard_err == 0  -> budget = min(max, budget + STEP)
  else                                   -> hold

`fetched_err` in the metrics table counts EVERY non-200 row (the
stats-parity definition), which includes 3xx redirects and the
retryable 429/conn-fail rows already counted in `retries`.  The
controller must not treat redirects as errors (an http->https 301 is
routine — a host that serves any would otherwise never regain budget)
nor double-count retryables in the rate (an all-429 round would push
err_rate to 2.0).  Redirects and retries are disjoint subsets of the
non-200 rows (3xx vs 429/status-0), so the subtraction recovers the
genuine hard-error count — 4xx/5xx plus retry-exhausted rows — and
keeps err_rate in [0, 1].
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

ALPHA = 0.3          # EWMA smoothing for the error rate
EWMA_OK = 0.1        # below this (and a clean round): additive increase
STEP = 4             # additive increase per clean round
DEFAULT_BUDGET = 16  # matches CrawlConfig.per_host_budget's default

BUDGET_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("budget", T.IntegerType(), False),
        T.StructField("ewma_err", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("budget", T.IntegerType(), False),
        T.StructField("ewma_err", T.DoubleType(), False),
        T.StructField("last_round", T.IntegerType(), False),
    ]
)


def _controller(base: int, min_budget: int, max_budget: int):
    """Build the per-group transition function (closure over the
    control-law constants; the returned function is what Spark ships
    to the Arrow state worker)."""

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: "GroupState",
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            budget, ewma, last_round = state.get
        else:
            budget, ewma, last_round = base, 0.0, -1
        rows = pd.concat(list(pdfs), ignore_index=True)
        # metrics commit once per round, but a micro-batch may carry
        # several rounds (catch-up) — apply transitions in round order,
        # ignoring replays of rounds already folded into the state
        rows = rows[rows["round"] > last_round].sort_values("round")
        out = []
        for r in rows.itertuples(index=False):
            sched = int(r.scheduled)
            retries = int(r.retries)
            hard_err = max(
                0, int(r.fetched_err) - int(r.redirects) - retries
            )
            err_rate = (hard_err + retries) / sched if sched > 0 else 0.0
            ewma = (1.0 - ALPHA) * ewma + ALPHA * err_rate
            if retries > 0:
                budget = max(min_budget, budget // 2)
            elif hard_err == 0 and ewma < EWMA_OK:
                budget = min(max_budget, budget + STEP)
            out.append(
                {
                    "host": key[0],
                    "round": int(r.round),
                    "budget": int(budget),
                    "ewma_err": float(ewma),
                }
            )
            last_round = int(r.round)
        state.update((int(budget), float(ewma), int(last_round)))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in BUDGET_SCHEMA.fields]
            )

    return update


def adaptive_budgets(
    metrics: DataFrame,
    base: int = DEFAULT_BUDGET,
    min_budget: int = 1,
    max_budget: int = 256,
) -> DataFrame:
    """The streaming recommendation frame: one row per (host, round)
    observed, carrying the budget the scheduler should grant that host
    next.  `metrics` is a streaming DataFrame (metrics_readstream);
    output mode must be `update` (state never finalizes — hosts keep
    crawling)."""
    return metrics.select(
        "host", "round", "scheduled", "fetched_err", "redirects", "retries"
    ).groupBy("host").applyInPandasWithState(
        _controller(base, min_budget, max_budget),
        outputStructType=BUDGET_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def replay_budgets(
    metrics_batch: DataFrame,
    base: int = DEFAULT_BUDGET,
    min_budget: int = 1,
    max_budget: int = 256,
) -> DataFrame:
    """Batch replay of the identical control law over a static metrics
    table (applyInPandas, no state handle) — the backfill/audit form,
    and the test oracle for the streaming operator: one pass over the
    full history must equal the concatenation of incremental streamed
    updates."""
    fn = _controller(base, min_budget, max_budget)

    class _FakeState:
        exists = False

        def update(self, v):  # terminal batch: nothing to carry
            pass

    def once(key: Tuple[str], pdf: pd.DataFrame) -> pd.DataFrame:
        frames = list(fn(key, iter([pdf]), _FakeState()))
        return (
            frames[0]
            if frames
            else pd.DataFrame(
                columns=[f.name for f in BUDGET_SCHEMA.fields]
            )
        )

    return (
        metrics_batch.select(
            "host", "round", "scheduled", "fetched_err", "redirects",
            "retries",
        )
        .groupBy("host")
        .applyInPandas(once, schema=BUDGET_SCHEMA)
    )


def fold_budgets_step(
    state: DataFrame,
    round_metrics: DataFrame,
    base: int = DEFAULT_BUDGET,
    min_budget: int = 1,
    max_budget: int = 256,
) -> DataFrame:
    """ONE native AIMD transition — the in-crawl-loop form of the same
    control law: fold a single round's per-host metrics into the
    persisted budget state (schemas.BUDGETS) entirely in native
    expressions (no Python worker on the crawl's hot path).

    The streaming operator and the batch replay recompute history; a
    10k-round crawl calling the replay per round pays O(rounds^2)
    cumulative, so the driver instead keeps the state table and folds
    only the NEW round — the same incremental-maintenance discipline as
    the bloom tier.  Equality with replay_budgets over the full metrics
    lineage is the property the tests pin.

    Rounds already folded (round <= last_round — a rolled-back and
    re-run round, or a replayed commit) leave the state unchanged, so
    the fold is idempotent."""
    m = round_metrics.select(
        F.col("host").alias("__m_host"),
        F.col("round").alias("__m_round"),
        "scheduled", "fetched_err", "redirects", "retries",
    )
    j = state.join(m, state["host"] == F.col("__m_host"), "full")
    budget0 = F.coalesce(F.col("budget"), F.lit(base))
    ewma0 = F.coalesce(F.col("ewma_err"), F.lit(0.0))
    last0 = F.coalesce(F.col("last_round"), F.lit(-1))
    fresh = F.col("__m_round").isNotNull() & (F.col("__m_round") > last0)
    hard_err = F.greatest(
        F.lit(0),
        F.col("fetched_err") - F.col("redirects") - F.col("retries"),
    )
    err_rate = F.when(
        F.col("scheduled") > 0,
        (hard_err + F.col("retries")) / F.col("scheduled").cast("double"),
    ).otherwise(F.lit(0.0))
    ewma1 = F.lit(1.0 - ALPHA) * ewma0 + F.lit(ALPHA) * err_rate
    budget1 = (
        F.when(
            F.col("retries") > 0,
            F.greatest(F.lit(min_budget), F.floor(budget0 / 2).cast("int")),
        )
        .when(
            (hard_err == 0) & (ewma1 < F.lit(EWMA_OK)),
            F.least(F.lit(max_budget), budget0 + F.lit(STEP)),
        )
        .otherwise(budget0)
    )
    return j.select(
        F.coalesce(F.col("host"), F.col("__m_host")).alias("host"),
        F.when(fresh, budget1).otherwise(budget0).cast("int").alias("budget"),
        F.when(fresh, ewma1).otherwise(ewma0).alias("ewma_err"),
        F.when(fresh, F.col("__m_round")).otherwise(last0)
        .cast("int").alias("last_round"),
    )
