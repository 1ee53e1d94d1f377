"""North-rule deployment shape: ``spark-submit --py-files crawler.zip
run_crawl.py`` (BASELINE.json north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

The reference ships a single static binary (cmd/main.go); our cluster
artifact is the zipped package.  This e2e test stages ONLY run_crawl.py
plus the zip in an empty temp cwd, so ``zeno_spark`` must resolve from
--py-files exactly as on a real cluster, and asserts the driver ran on
the ``--master`` the submit flag chose (session.py defers to spark-submit
when PYSPARK_GATEWAY_PORT is set) rather than the local-mode fallback.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(dest: Path) -> None:
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "zeno_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this image"
)
def test_spark_submit_py_files_crawl(tmp_path):
    _build_zip(tmp_path / "crawler.zip")
    shutil.copy(REPO / "run_crawl.py", tmp_path / "run_crawl.py")
    wh = tmp_path / "wh"

    env = dict(os.environ)
    # The staged cwd must be the only import root: drop any PYTHONPATH
    # pointing back at the repo so --py-files is what provides zeno_spark.
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", "crawler.zip",
            "run_crawl.py",
            "--synthetic-pages", "400",
            "--rounds", "2",
            "--warehouse", str(wh),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    master_line = next(l for l in lines if "spark_master" in l)
    # --master local[2] must win over the session factory's local-mode
    # default (cores=32) — the cluster-deployment contract.
    assert master_line["spark_master"] == "local[2]"

    rounds = [l for l in lines if "fetched_ok" in l]
    assert len(rounds) == 2
    assert sum(r["fetched_ok"] for r in rounds) > 0
    assert sum(r["discovered"] for r in rounds) > 0
    # The warehouse took real commits (numbered manifests published).
    manifests = list(wh.rglob("_manifests/*.json"))
    assert manifests, "no committed table manifests under the warehouse"
