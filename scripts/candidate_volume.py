"""Candidate-VOLUME evidence for the exact jaccard tier (VERDICT r03
next-round #5's done criterion: "the exact tier's super-linear candidate
volume visible").

Wall time alone can't show the exact tier's quadratic term — the r4
growth-curve run measured a NEGATIVE step exponent (-0.44) for
dedup_jaccard at the synthetic 3x point (40.4s -> 25.1s with 3x docs),
which looks like magic until you count rows instead of seconds.  This
probe counts the actual work units at each scale point:

  * posting_rows    — distinct (doc, token) pairs AFTER the DF_CAP
                      (df > 10,000 tokens dropped);
  * capped_tokens   — distinct tokens the DF_CAP removed (0 until a
                      token's df exceeds 10k docs);
  * cand_pairs      — output of the prefix+length+positional filter
                      pair generation (`_jaccard_candidates`): the
                      quadratic term the All-Pairs prefix filter is
                      bounding;
  * true_pairs      — verified J>=0.7 pairs (the irreducible output).

Expected shape: sf0.01 -> sf0.1 (10x docs, same token distribution)
shows cand_pairs growing ~df^2-superlinearly; at the synthetic 3x point
(15k docs) the DF_CAP starts dropping stopword-grade tokens (df > 10k
is only possible with > 10k docs), so posting rows per doc SHRINK and
candidate volume — and hence wall time — can legitimately fall.  That
is the declared semantics working (dedup.py:30-34: the cap is part of
the operator's contract, mirrored in the oracle), not parallelism
hiding work.

Each point runs in its own subprocess (cold JVM) like growth_curve.py.

Usage: python scripts/candidate_volume.py [sf_dir ...] [--cores N]
Default points mirror scripts/growth_curve.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def worker(sf_dir: str, cores: int) -> None:
    from pyspark.sql import functions as F

    from zeno_spark.datapipe.dedup import (
        DF_CAP, _jaccard_candidates, jaccard_pairs,
    )
    from zeno_spark.session import get_spark

    spark = get_spark("candvol", cores=cores, shuffle_partitions=cores)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    # raw token df BEFORE the cap, to count what the cap removes
    raw = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    ).filter(F.col("token") != "")
    df_tbl = raw.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    capped = df_tbl.filter(F.col("df") > DF_CAP)
    capped_tokens = capped.count()
    capped_posting_rows = (
        capped.agg(F.sum("df")).collect()[0][0] or 0
    )
    cand, posting = _jaccard_candidates(docs, "text", 7, 10)
    posting_rows = posting.count()
    t0 = time.time()
    cand_pairs = cand.count()
    cand_sec = round(time.time() - t0, 2)
    t0 = time.time()
    true_pairs = jaccard_pairs(docs).count()
    full_sec = round(time.time() - t0, 2)
    print("CANDVOL_RESULT " + json.dumps({
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "posting_rows": posting_rows,
        "capped_tokens": capped_tokens,
        "capped_posting_rows": int(capped_posting_rows),
        "cand_pairs": cand_pairs,
        "true_pairs": true_pairs,
        "cand_sec": cand_sec,
        "full_sec": full_sec,
    }), flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="*", default=None,
                    help="scale-point dirs; `synth:K` = K-fold upsample "
                         "of sf0.1 (shared with growth_curve.py)")
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.cores)
        return
    from growth_curve import SYNTH_BASE, synth_upsample

    dirs = args.dirs or ["/root/testdata/sf0.01", "/root/testdata/sf0.1",
                         "synth:3"]
    resolved = []
    for d in dirs:
        if d.startswith("synth:"):
            resolved.append(synth_upsample(SYNTH_BASE, int(d.split(":", 1)[1])))
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
            if ln.startswith("CANDVOL_RESULT ")
        )
        r = json.loads(line[len("CANDVOL_RESULT "):])
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({
        "points": [
            {k: r[k] for k in (
                "n_docs", "posting_rows", "capped_tokens", "cand_pairs",
                "true_pairs")}
            for r in results
        ],
        "cores": args.cores,
    }), flush=True)


if __name__ == "__main__":
    main()
