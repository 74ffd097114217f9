"""North-rule launch path: `spark-submit --py-files <zip> run_tiers.py`.

The cluster contract (BASELINE.json) launches the tier pipeline with
spark-submit and ships the engine as a --py-files zip.  This test runs
that exact command: the launcher script is copied OUTSIDE the repo so
``import repurpose_spark`` can only resolve from the shipped zip — if
the packaging is broken, the submit fails.
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


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_runs_tier_pipeline(tmp_path):
    zip_path = tmp_path / "repurpose_spark.zip"
    pkg = os.path.join(REPO, "repurpose_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    # launcher outside the repo: its sys.path trick points at tmp_path,
    # which holds no package — the zip is the only import source
    launcher = tmp_path / "scripts" / "run_tiers.py"
    launcher.parent.mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "run_tiers.py"), launcher)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--py-files",
            str(zip_path),
            str(launcher),
            "--docs",
            "1500",
            "--cpus",
            "2",
            "--batches",
            "2",
            "--cells",
            "8",
            "--parts",
            "8",
            "--json",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ][-1]
    rec = json.loads(line)
    assert rec["n_tokens"] > 0
    assert rec["n_packed"] == 1500
    assert rec["tokens_per_sec"] > 0
