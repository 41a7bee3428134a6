"""The BASELINE.json ship form, exercised literally: `spark-submit
--py-files dedup.zip jobs/run_dedup.py` as a real subprocess — the
packaged zip (not the repo checkout) must supply the `dedup` package,
and the staged run must commit docs/signatures/edges/clusters/report
snapshots readable afterwards. This is the packaging contract the
in-process staged-run tests cannot cover."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

pytestmark = pytest.mark.slow  # multi-minute: deselect with -m "not slow"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.modules.get("pyspark", type("m", (), {"__file__": ""})).__file__ or ""),
    "bin",
    "spark-submit",
)


def _zip_dedup(dest: str) -> str:
    zpath = os.path.join(dest, "dedup.zip")
    src = os.path.join(REPO, "dedup")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(src):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit binary not available",
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    import pyspark  # ensure importable before resolving the binary

    zpath = _zip_dedup(str(tmp_path))
    wh = str(tmp_path / "wh_submit")
    env = dict(os.environ)
    # the job must import dedup from the ZIP, not the checkout: run a
    # COPY of the job file from outside the repo (its own repo-relative
    # sys.path insert then points at an empty dir) with no PYTHONPATH
    env["PYTHONPATH"] = ""
    env.setdefault("SPARK_DRIVER_MEM", "4g")
    job_dir = tmp_path / "jobs"
    job_dir.mkdir()
    job = str(job_dir / "run_dedup.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "run_dedup.py"), job)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", zpath,
            job,
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--warehouse", wh,
            "--run-id", "submit-e2e",
        ],
        cwd=str(tmp_path),  # NOT the repo root — the zip is the package source
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["run_id"] == "submit-e2e"
    assert out["ran"] == ["docs", "signatures", "edges", "clusters", "report"]
    # committed warehouse is readable after the job exits
    from dedup.session import get_spark
    from dedup.tableio import TableIO

    spark = get_spark(master="local[4]")
    tio = TableIO(spark, wh, backend="parquet")
    n_docs = tio.read("docs").count()
    assert n_docs > 0
    assert tio.read("clusters").count() == n_docs
    stages = {r.stage for r in tio.read("lineage").select("stage").collect()}
    assert {"docs", "signatures", "edges", "clusters", "report"} <= stages


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit binary not available",
)
def test_spark_submit_curate_job(tmp_path):
    """The curation job ships the same way: zip-only imports (including
    dedup.jobrunner, the shared stage machinery) + standalone job file."""
    import pyspark  # noqa: F401

    zpath = _zip_dedup(str(tmp_path))
    wh = str(tmp_path / "wh_curate")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.setdefault("SPARK_DRIVER_MEM", "4g")
    job_dir = tmp_path / "jobs"
    job_dir.mkdir()
    job = str(job_dir / "curate_corpus.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "curate_corpus.py"), job)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", zpath,
            job,
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--warehouse", wh,
            "--run-id", "curate-e2e",
            "--min-chars", "80",
            "--min-tokens", "10",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["ran"] == [
        "docs", "signals", "funnel", "signatures", "edges", "clusters",
        "report", "deduped", "corpus",
    ]
    from dedup.session import get_spark
    from dedup.tableio import TableIO

    spark = get_spark(master="local[4]")
    tio = TableIO(spark, wh, backend="parquet")
    assert tio.read("corpus").count() > 0
    assert {r.stage for r in tio.read("funnel").collect()} == {
        "total", "len_ok", "tok_ok", "rep_ok", "kept"
    }
