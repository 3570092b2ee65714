"""North-rule deployment smoke: the pipeline must run via
`spark-submit --py-files <packaged library>` (BASELINE.json north_rule).
This test actually exercises that path — the library is zipped, the
entry script is copied OUTSIDE the repo (so its sys.path fallback points
at an empty directory and the import can only be satisfied by the
shipped zip), and a real spark-submit subprocess runs the pipeline
end to end on local[4]."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return p if os.path.exists(p) else None
    except ImportError:
        return None


def test_spark_submit_py_files_runs_pipeline(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")

    # package the library exactly as the run_pipeline.py docstring says
    zpath = str(tmp_path / "ords.zip")
    pkg = os.path.join(REPO, "ocaml_rdf_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # copy the entry script outside the repo: its sys.path.insert will
    # point at tmp_path (no package there) — import MUST come from the zip
    script = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)

    root = str(tmp_path / "kg")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing up our sleeve
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            script,
            "--root", root, "--pages", "300", "--parts", "2", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    stages = [json.loads(l) for l in out.stdout.splitlines() if l.startswith('{"stage"') or l.startswith('{"name"')]
    if not stages:  # stage lines may use another leading key — fall back
        stages = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{") and '"rows"' in l]
    assert stages, f"no stage JSON in stdout:\n{out.stdout[-2000:]}"
    # the store materialization stage produced triples
    assert any(s.get("rows", 0) > 0 for s in stages)
    # resume contract: committed outputs exist under --root
    assert os.path.isdir(root) and os.listdir(root)
