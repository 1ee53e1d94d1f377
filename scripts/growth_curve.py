"""Datapipe scaling-exponent evidence (VERDICT r02 item 9): run the
heavy dedup operators at two corpus scales and report the measured
growth exponent e where cost ~ n^e — so the "LSH prunes the quadratic
term" claim carries a measured curve, not a single point.

  * dedup_jaccard is the EXACT prefix-filtered set-similarity join
    (All-Pairs): its candidate set is sum over prefix tokens of df^2,
    so e is expected >1 (intrinsic to exactness) but far below the
    naive join's 2.
  * dedup_minhash_lsh / dedup_simhash / dedup_embedding are the banded
    tiers: candidates come from band-bucket equi-joins, so e should
    stay near 1 plus the (data-dependent) growth of true near-dup
    pairs.
  * dedup_clusters is iterative CC over the simhash graph: rounds are
    O(log diameter), per-round cost ~ edges.

Each scale runs in its own subprocess (cold JVM, like the bench's
scaling legs) so JVM state never leaks across points.

Usage: python scripts/growth_curve.py [sf_lo_dir] [sf_hi_dir] [cores]
Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1 16.
Prints one JSON line per (query, scale) and a summary with exponents.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QUERIES = (
    "dedup_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding", "dedup_clusters", "embedding_clusters",
)

SF_LO = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SF_HI = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def worker(sf_dir: str) -> None:
    import __spark_entry__ as entrymod

    from zeno_spark.session import get_spark

    spark = get_spark("growth", cores=CORES, shuffle_partitions=CORES)
    qs = entrymod.queries()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    n_embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    # warmup: codegen + python workers + parquet footers
    qs["doc_simhash"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    out = {}
    for name in QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    print("GROWTH_RESULT " + json.dumps(
        {"sf_dir": sf_dir, "n_docs": n_docs, "n_embs": n_embs,
         "times": out}), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 4 and sys.argv[4] == "--worker":
        worker(sys.argv[1])
        return
    results = []
    for sf in (SF_LO, SF_HI):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf, SF_HI,
             str(CORES), "--worker"],
            stdout=subprocess.PIPE, text=True, check=True,
        )
        line = next(
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("GROWTH_RESULT ")
        )
        r = json.loads(line[len("GROWTH_RESULT "):])
        results.append(r)
        print(json.dumps(r), flush=True)
    lo, hi = results
    summary = {}
    for q in QUERIES:
        n_ratio = (
            (hi["n_embs"] / lo["n_embs"])
            if "embedding" in q else (hi["n_docs"] / lo["n_docs"])
        )
        t_ratio = hi["times"][q] / max(lo["times"][q], 1e-6)
        summary[q] = {
            "t_lo": lo["times"][q], "t_hi": hi["times"][q],
            "exponent": round(math.log(t_ratio) / math.log(n_ratio), 2),
        }
    print(json.dumps({"n_ratio_docs": hi["n_docs"] / lo["n_docs"],
                      "exponents": summary}), flush=True)


if __name__ == "__main__":
    main()
