"""The north-rule deployment shape: the whole DAG runs under
``spark-submit --py-files kgner.zip`` (cluster-style code shipping — no
repo checkout on the executors), and rerunning with the same --workdir
resumes from the committed stages with identical output.

run.py is copied OUT of the repo before submitting so the only way the
job can import ``kgner`` is from the shipped zip."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kgner")
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))


def _submit(spark_submit: str, zip_path: str, run_py: str, workdir: str) -> dict:
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            run_py,
            "--workdir", workdir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=os.path.dirname(run_py),  # NOT the repo: kgner must come from the zip
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert out.returncode == 0, (out.stderr or "")[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    return json.loads(lines[-1])


def test_pipeline_under_spark_submit_with_py_files_and_resume(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not on PATH")
    zip_path = str(tmp_path / "kgner.zip")
    _make_zip(zip_path)
    run_py = str(tmp_path / "run.py")
    shutil.copyfile(os.path.join(REPO, "kgner", "run.py"), run_py)
    workdir = str(tmp_path / "kg_run")

    first = _submit(spark_submit, zip_path, run_py, workdir)
    assert first["triples"] > 0
    assert first["ran"] and not first["skipped"]
    # per-partition lineage rows were recorded for the committed stages
    assert first["lineage"]

    # same workdir -> every committed stage skips, identical triple count
    second = _submit(spark_submit, zip_path, run_py, workdir)
    assert second["triples"] == first["triples"]
    assert set(second["skipped"]) == set(first["ran"])
    assert not second["ran"]
