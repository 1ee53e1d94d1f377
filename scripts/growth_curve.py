"""Datapipe scaling-exponent evidence (VERDICT r02 item 9; extended for
the r3 verdict next-round #5): run the heavy dedup operators at SEVERAL
corpus scales and report measured growth exponents e where cost ~ n^e —
so the "LSH prunes the quadratic term" claim carries a measured curve,
not a single point.

  * dedup_jaccard is the EXACT prefix-filtered set-similarity join
    (All-Pairs): its candidate set is sum over prefix tokens of df^2,
    so e is expected >1 (intrinsic to exactness) but far below the
    naive join's 2.
  * dedup_minhash_lsh / dedup_simhash / dedup_embedding are the banded
    tiers: candidates come from band-bucket equi-joins, so e should
    stay near 1 plus the (data-dependent) growth of true near-dup pairs.
  * dedup_clusters is iterative CC over the simhash graph: rounds are
    O(log diameter), per-round cost ~ edges.

The r3 run's exponents were capacity-masked: at sf0.01-0.1 on a 16-slot
session most stages leave slots idle, so extra work at the hi point
absorbs into idle parallelism and the measured exponent under-reads.
This version (a) defaults to CORES=4 so every stage saturates its
slots, and (b) adds a THIRD scale point synthesized deterministically
from sf0.1 (see synth_upsample: k disjoint copies with per-copy token /
dimension-roll namespaces, so within-copy near-dup structure replicates
while cross-copy similarity stays below every threshold — true-pair
volume grows ~k, token df grows k, so the exact tier's df^2 candidate
term is visible while banded tiers stay ~linear).

Each scale runs in its own subprocess (cold JVM, like the bench's
scaling legs) so JVM state never leaks across points.

Usage: python scripts/growth_curve.py [sf_dir ...] [--cores N]
Default points: /root/testdata/sf0.01 /root/testdata/sf0.1 synth:3
where `synth:K` builds the K-fold upsample of sf0.1 under /tmp (cached).
Prints one JSON line per scale and a summary with per-step exponents.
"""

from __future__ import annotations

import argparse
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

SYNTH_BASE = "/root/testdata/sf0.1"


def synth_upsample(base_dir: str, k: int) -> str:
    """Deterministic k-fold upsample of a documents/embeddings pair into
    /tmp (cached by marker).  Copy c keeps copy 0's within-copy dup
    structure but is dissimilar ACROSS copies:

      * documents: every 5th token is replaced by a copy-tagged token
        (`zq<c>t<i>`), dropping cross-copy Jaccard under ~0.66 — below
        the 0.8 thresholds the pair tiers use — while within-copy
        near-dup pairs replicate exactly;
      * embeddings: dimensions roll by c*7 — cosine between a vector
        and its rolled copy is ~random for these synthetic vectors, so
        embedding near-dup structure also replicates per copy.

    ids offset by c*10^7 so keys stay unique."""
    out = os.path.join("/tmp", f"zeno_growth_synth_{k}x")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    d = docs.to_pydict()
    big = {name: [] for name in docs.column_names}
    for c in range(k):
        for i in range(docs.num_rows):
            big["doc_id"].append(d["doc_id"][i] + c * 10_000_000)
            txt = d["text"][i]
            if c > 0 and txt:
                toks = txt.split(" ")
                toks = [
                    f"zq{c}t{j % 97}" if j % 5 == 0 else t
                    for j, t in enumerate(toks)
                ]
                txt = " ".join(toks)
            big["text"].append(txt)
            big["lang"].append(d["lang"][i])
            big["source"].append(d["source"][i])
            big["n_chars"].append(len(txt) if txt else 0)
    pq.write_table(
        pa.table(big, schema=pa.schema(
            [(n, docs.schema.field(n).type) for n in docs.column_names]
        )),
        os.path.join(out, "documents.parquet"),
    )
    embs = pq.read_table(os.path.join(base_dir, "embeddings.parquet"))
    e = embs.to_pydict()
    vecs = np.array(e["embedding"], dtype=np.float32)
    eb = {"vec_id": [], "embedding": [], "label": []}
    for c in range(k):
        rolled = np.roll(vecs, c * 7, axis=1)
        eb["vec_id"].extend(v + c * 10_000_000 for v in e["vec_id"])
        eb["embedding"].extend(rolled.tolist())
        eb["label"].extend(e["label"])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(eb["vec_id"], type=pa.int64()),
                "embedding": pa.array(
                    eb["embedding"], type=pa.list_(pa.float32())
                ),
                "label": pa.array(eb["label"], type=pa.int32()),
            }
        ),
        os.path.join(out, "embeddings.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def worker(sf_dir: str, cores: int) -> None:
    import __spark_entry__ as entrymod

    from zeno_spark.session import get_spark

    spark = get_spark("growth", cores=cores, shuffle_partitions=cores)
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
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="*", default=None,
                    help="scale-point dirs; `synth:K` = K-fold upsample "
                         "of sf0.1 built under /tmp")
    ap.add_argument("--cores", type=int, default=4,
                    help="slots per point — keep LOW so tasks saturate "
                         "and exponents measure work, not idle headroom")
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.cores)
        return
    dirs = args.dirs or ["/root/testdata/sf0.01", "/root/testdata/sf0.1",
                         "synth:3"]
    resolved = []
    for d in dirs:
        if d.startswith("synth:"):
            k = int(d.split(":", 1)[1])
            print(json.dumps({"building_synth_point": k}), flush=True)
            resolved.append(synth_upsample(SYNTH_BASE, k))
        else:
            resolved.append(d)
    results = []
    for sf in resolved:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cores", str(args.cores), "--worker", sf],
            stdout=subprocess.PIPE, text=True, check=True,
        )
        line = next(
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("GROWTH_RESULT ")
        )
        r = json.loads(line[len("GROWTH_RESULT "):])
        results.append(r)
        print(json.dumps(r), flush=True)
    summary = {}
    for q in QUERIES:
        steps = []
        for lo, hi in zip(results, results[1:]):
            n_ratio = (
                (hi["n_embs"] / lo["n_embs"])
                if "embedding" in q else (hi["n_docs"] / lo["n_docs"])
            )
            t_ratio = hi["times"][q] / max(lo["times"][q], 1e-6)
            steps.append(round(math.log(t_ratio) / math.log(n_ratio), 2))
        summary[q] = {
            "times": [r["times"][q] for r in results],
            "step_exponents": steps,
        }
    print(json.dumps({
        "points_docs": [r["n_docs"] for r in results],
        "points_embs": [r["n_embs"] for r in results],
        "cores": args.cores,
        "exponents": summary,
    }), flush=True)


if __name__ == "__main__":
    main()
