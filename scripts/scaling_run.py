"""The N / 4N scaling-efficiency experiment (BASELINE.md protocol).

Runs the SAME crawl job (same deterministic corpus, same seed list,
same round count) at two parallelism levels and reports throughput at
both plus efficiency = (tp_high / tp_low) / (high / low).

The corpus here is sized so each round is COMPUTE-dominated (thousands
of core-seconds of fetch/parse/expand per round) rather than dominated
by the fixed per-round commit latency — the regime a 10^10-URL frontier
is always in.  bench.py's per-round pair at the sf0.1 corpus size gives
a latency-bound lower bound; this experiment is the scaling evidence.

Usage: python scripts/scaling_run.py [n_pages] [rounds] [seed_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("ZENO_DRIVER_MEM", "24g")

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SEED_FRAC = int(sys.argv[3]) if len(sys.argv) > 3 else 2
N_HOSTS = max(20, N_PAGES // 200)
# N and 4N task slots.  Default (4, 1): the measured host CPU curve
# (BASELINE.md "Choosing N") saturates at ~12.5 effective cores, so
# 1->4 is the largest window where 4x the task slots actually get 4x
# the silicon; beyond ~8 slots the hypervisor adds no capacity and
# every extra pandas-UDF task (JVM thread + Python worker) just
# oversubscribes.
CORES = (
    (int(sys.argv[4]), int(sys.argv[5])) if len(sys.argv) > 5 else (4, 1)
)


def run_at(cores: int) -> dict:
    import bench
    from zeno_spark.session import get_spark

    spark = get_spark(f"scaling{cores}", cores=cores,
                      shuffle_partitions=cores, aqe=False)
    bench._run_crawl(spark, n_pages=300, n_hosts=10, rounds=1, seed_frac=2)
    t0 = time.time()
    stats, wall, n_corpus = bench._run_crawl(
        spark, n_pages=N_PAGES, n_hosts=N_HOSTS, rounds=ROUNDS,
        seed_frac=SEED_FRAC,
    )
    build_wall = time.time() - t0 - wall
    spark.stop()
    fetched = sum(s.fetched_ok for s in stats)
    frontier = sum(s.scheduled + s.discovered for s in stats)
    out = {
        "cores": cores,
        "crawl_wall_sec": round(wall, 1),
        "corpus_build_sec": round(build_wall, 1),
        "fetched_pages": fetched,
        "frontier_urls_processed": frontier,
        "fetched_pages_per_sec": round(fetched / wall, 1),
        "frontier_urls_per_sec": round(frontier / wall, 1),
    }
    print("RESULT", json.dumps(out), flush=True)
    return out


def main() -> None:
    print(f"scaling run: n_pages={N_PAGES} hosts={N_HOSTS} "
          f"rounds={ROUNDS} seed_frac={SEED_FRAC}", flush=True)
    results = {c: run_at(c) for c in CORES}
    hi, lo = CORES
    eff = (
        results[hi]["fetched_pages_per_sec"]
        / results[lo]["fetched_pages_per_sec"]
    ) / (hi / lo)
    print("EFFICIENCY", json.dumps({
        "low_cores": lo, "high_cores": hi,
        "low_pages_per_sec": results[lo]["fetched_pages_per_sec"],
        "high_pages_per_sec": results[hi]["fetched_pages_per_sec"],
        "low_urls_per_sec": results[lo]["frontier_urls_per_sec"],
        "high_urls_per_sec": results[hi]["frontier_urls_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
