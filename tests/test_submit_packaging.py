"""spark-submit --py-files packaging smoke test (north_star packaging).

Proves the deliverable actually runs the way a cluster would launch it:
``scripts/package.py`` builds the zip, then a REAL ``spark-submit
--py-files dist/logzilla_spark.zip main.py ...`` subprocess executes an
incremental pipeline run — from a temp cwd, so ``logzilla_spark`` can
only be imported from the zip, never from the repo checkout.

Reference analog: the engine binary run via ``just run-engine``
(reference: justfile:1-5, cmd/engine/main.go).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from package import build_zip  # noqa: E402

SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_zip_layout(tmp_path):
    import zipfile

    z = build_zip(str(tmp_path / "logzilla_spark.zip"))
    names = zipfile.ZipFile(z).namelist()
    assert "logzilla_spark/__init__.py" in names
    assert "logzilla_spark/plans/pipeline.py" in names
    assert all(n.startswith("logzilla_spark/") for n in names)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    from logzilla_spark.testdata import ensure_pages

    fixtures = ensure_pages("sf0.001")
    zip_path = build_zip(str(tmp_path / "logzilla_spark.zip"))
    main_py = str(tmp_path / "main.py")
    shutil.copy(os.path.join(REPO, "main.py"), main_py)
    wh = str(tmp_path / "wh")

    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        main_py,
        "--warehouse", wh,
        "--ingest", f"{fixtures}/pages.parquet",
        "--dims", fixtures,
        "--run-id", "submit-smoke",
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    report = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["run_id"] == "submit-smoke"
    assert report["rows_in"] == 500
    assert set(report["rows_routed"]) == {"json", "access", "unparsed"}
    assert sum(report["rows_routed"].values()) > 0

    # a second submit with no new input is a no-op (checkpoint honored)
    out2 = subprocess.run(
        [c for c in cmd if c not in (f"{fixtures}/pages.parquet", "--ingest")],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr[-4000:]
    report2 = json.loads(
        [l for l in out2.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report2["rows_in"] == 0
