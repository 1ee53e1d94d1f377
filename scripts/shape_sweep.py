"""Second-shape scaling evidence (BASELINE.md protocol, SURVEY round-3
item 4): re-run the official N/4N crawl scaling pair at a DIFFERENT
corpus shape, to show the ≥0.8 efficiency isn't an artifact of one host
distribution.

Shapes (same page count, same image sizes, same rounds — only the host
axis moves):
  * dense-hosts  (pages/host = 200, the official bench shape): many
    hosts, shallow per-host FIFOs — the politeness window is wide and
    flat, shuffle keys spread naturally.
  * sparse-hosts (pages/host = 1000): 5x fewer hosts, 5x deeper
    per-host queues — hotter politeness partitions, the regime where
    the salted window (schedule.py) has to do real work.

Protocol per shape = bench.py's: one corpus materialized once, each leg
a fresh subprocess (cold JVM), interleaved lo/hi, per-leg best reported
(one-sided host noise).  Fewer draws than the official bench (this is
supplementary evidence, not the gating artifact): REPS x (lo, hi) + 1
extra hi.

Usage: python scripts/shape_sweep.py [pages] [reps] [densities]
  densities: comma-separated pages-per-host list (default "200,1000")
Writes one JSON line per shape + a summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
_DENSITIES = (
    [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3
    else [200, 1000]
)
LOW, HIGH = 1, 4
SF = 0.1

_NAMES = {200: "dense-hosts", 1000: "sparse-hosts"}
SHAPES = [
    {"name": _NAMES.get(d, f"density-{d}"), "density": d} for d in _DENSITIES
]


def _env(density: int) -> dict:
    env = dict(os.environ)
    env["ZENO_BENCH_PAGES_PER_SF"] = str(int(PAGES / SF))
    env["ZENO_BENCH_HOST_DENSITY"] = str(density)
    return env


def _worker(cores: int, env: dict) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"),
         "--crawl-worker", str(cores), str(SF)],
        stdout=subprocess.PIPE, text=True, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CRAWL_RESULT "):
            return json.loads(line[len("CRAWL_RESULT "):])
    raise RuntimeError(f"no CRAWL_RESULT (cores={cores}, rc={proc.returncode})")


def main() -> None:
    out = []
    for shape in SHAPES:
        env = _env(shape["density"])
        subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--build-corpus", str(SF)],
            check=True, env=env,
        )
        reps: dict[int, list[dict]] = {LOW: [], HIGH: []}
        for _ in range(REPS):
            for cores in (LOW, HIGH):
                reps[cores].append(_worker(cores, env))
                time.sleep(10)
        reps[HIGH].append(_worker(HIGH, env))  # cheap extra hi draw
        lo = max(reps[LOW], key=lambda r: r["fetched_pages_per_sec"])
        hi = max(reps[HIGH], key=lambda r: r["fetched_pages_per_sec"])
        eff = round(
            (hi["fetched_pages_per_sec"] / lo["fetched_pages_per_sec"])
            / (HIGH / LOW), 3)
        row = {
            "shape": shape["name"],
            "pages_per_host": shape["density"],
            "n_pages": lo["crawl_pages"],
            "low_cores": LOW, "high_cores": HIGH,
            "low_pages_per_sec": lo["fetched_pages_per_sec"],
            "high_pages_per_sec": hi["fetched_pages_per_sec"],
            "low_urls_per_sec": lo["frontier_urls_per_sec"],
            "high_urls_per_sec": hi["frontier_urls_per_sec"],
            "scaling_efficiency": eff,
            "reps_pages_per_sec": {
                str(c): [r["fetched_pages_per_sec"] for r in rs]
                for c, rs in reps.items()
            },
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "summary": {r["shape"]: r["scaling_efficiency"] for r in out}
    }))


if __name__ == "__main__":
    main()
