"""End-to-end `spark-submit --py-files` evidence for the north rule.

The north rule requires the job to "run via spark-submit --py-files on a
multi-executor cluster" (BASELINE.json:north_rule). This test launches the
real thing: ``scripts/make_pyfiles_zip.py`` builds the code zip, then
``spark-submit --master local-cluster[2,1,2048] --py-files <zip>``
runs a 3-round crawl on the deterministic fixture corpus — with
PYTHONPATH scrubbed from the child environment, so the package can ONLY
reach the executors through the ``--py-files`` zip. Two real executor
JVMs participate (own heap / Python worker pool each), i.e. the same
multi-process topology bench.py measures for scaling efficiency.

Deterministic expectations come from the same fixture the in-process
crawl tests use (tests/test_crawl_order.py), so a pass here proves the
packaged artifact computes the identical crawl as the dev tree.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def test_spark_submit_pyfiles_crawl(tmp_path):
    zip_path = str(tmp_path / "t2m.zip")
    build = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py"), zip_path],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert build.returncode == 0, build.stderr
    assert os.path.getsize(zip_path) > 10_000

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    workdir = str(tmp_path / "crawl_run")
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local-cluster[2,1,2048]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.executor.memory=2g",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "run_crawl.py"),
            "--workdir",
            workdir,
            "--fixture",
            "20",
            "--budget",
            "2",
            "--rounds",
            "3",
            "--n-buckets",
            "8",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=540,
        cwd=str(tmp_path),  # NOT the repo root: import must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # run_crawl.py prints one summary line; the fixture crawl is deterministic.
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("rounds=")]
    assert line, proc.stdout
    fields = dict(part.split("=") for part in line[0].split())
    assert fields["rounds"] == "3"
    assert int(fields["extracted"]) > 0
    assert int(fields["seen"]) > int(fields["extracted"])
    assert int(fields["trace"]) >= int(fields["extracted"])
