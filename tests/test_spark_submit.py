"""spark-submit --py-files deployment smoke test (north-rule clause:
"runs via spark-submit --py-files on multi-executor clusters").

The test proves the package is fully self-contained in the shipped zip:
submit_pipeline.py is copied into a temp directory (so its own
repo-relative sys.path fallback points at the temp dir, NOT the repo) and
``fonduer_spark`` is importable ONLY from the --py-files zip that
spark-submit puts on the driver/executor path — any stray absolute path,
data-file dependency, or missing submodule in the zip fails the run.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(tmp_path) -> str:
    zpath = str(tmp_path / "fonduer_spark.zip")
    pkg = os.path.join(REPO, "fonduer_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed")
def test_spark_submit_py_files_end_to_end(tmp_path):
    zpath = _build_zip(tmp_path)
    script = str(tmp_path / "submit_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_pipeline.py"), script)
    out_dir = str(tmp_path / "kg")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zpath, script,
         "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir,
         "--cores", "4"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # last stdout line is the JSON result record
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    # 3229 = the sf0.001 gold triple count (same invariant the e2e drive
    # and kg_triples oracle assert)
    assert rec["n_triples"] == 3229
    assert any(e["stage"] == "triples" for e in rec["stages"])
    # snapshot-committed graph table landed on disk
    assert os.path.isdir(out_dir)
