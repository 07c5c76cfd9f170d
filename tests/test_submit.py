"""spark-submit --py-files deployment path (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Two layers: the --py-files zip is packaged correctly, and the CDC
pipeline submitted onto a REAL multi-executor master
(local-cluster[2,2,2048] — two separate executor JVMs, real
serialization and classpath boundaries) converges to the same final
table state as the in-process brute-force LWW oracle. PYTHONPATH is
scrubbed from the submit environment, so the run also proves the driver
and the executors' python workers import the engine off the distributed
zip, not off the repo checkout."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from tools.make_pyfiles import build
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.sources.eventlog import read_event_log
from tests.test_merge import brute_force_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    p = shutil.which("spark-submit")
    if p:
        return p
    cand = "/opt/spark/bin/spark-submit"
    return cand if os.access(cand, os.X_OK) else None


def test_pyfiles_zip_holds_package_at_root(tmpdir_path):
    zp = build(f"{tmpdir_path}/engine.zip")
    names = zipfile.ZipFile(zp).namelist()
    assert "tinyetl_spark/__init__.py" in names
    assert "tinyetl_spark/streaming/pipeline.py" in names
    assert "tinyetl_spark/lake/merge.py" in names
    assert not [n for n in names if "__pycache__" in n]
    assert not [n for n in names if not n.startswith("tinyetl_spark/")]


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit absent")
def test_local_cluster_submit_matches_oracle(spark, tmpdir_path):
    """Submitted multi-executor run == in-process oracle, bit-for-bit on
    (url, event_seq) state. datagen is deterministic, so the oracle is
    recomputed here from the log the submitted job generated and kept."""
    zp = build(f"{tmpdir_path}/engine.zip")
    work = f"{tmpdir_path}/job"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    p = subprocess.run(
        [_spark_submit(), "--master", "local-cluster[2,2,2048]",
         "--py-files", zp,
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.network.timeout=600s",
         os.path.join(REPO, "tools", "submit_cdc_job.py"),
         "--gen-events", "20000", "--work", work, "--keep-work"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON from submit (rc={p.returncode}): " \
                  f"{p.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["events"] == 20000
    assert res["executors"] >= 2, res
    assert res["master"] == "local-cluster[2,2,2048]"

    got = sorted((r["url"], r["event_seq"]) for r in
                 LakeTable(spark, f"{work}/table").read().collect())
    ev = read_event_log(spark, f"{work}/log")
    want = sorted((r["url"], r["event_seq"])
                  for r in brute_force_state(ev).collect())
    assert got == want
