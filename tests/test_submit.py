"""spark-submit --py-files packaging: the zip must be importable by
executors and the job entrypoint must run end-to-end (north-rule
packaging requirement)."""

from __future__ import annotations

import json
import pathlib
import shutil
import subprocess
import sys
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def test_zip_contains_package(tmp_path):
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "build_pyfiles.py"), str(tmp_path)],
        capture_output=True, text=True, check=True)
    zpath = pathlib.Path(r.stdout.strip())
    names = zipfile.ZipFile(zpath).namelist()
    assert "ksana_corpus_builder_spark/__init__.py" in names
    assert "ksana_corpus_builder_spark/plans/quality_pipeline.py" in names
    assert "ksana_corpus_builder_spark/streaming/incremental.py" in names
    assert not any(n.endswith(".pyc") for n in names)


def test_spark_submit_job_runs(tmp_path):
    if not pathlib.Path(SPARK_SUBMIT).exists():
        import pytest
        pytest.skip("no spark-submit in environment")
    zdir = tmp_path / "dist"
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "build_pyfiles.py"), str(zdir)],
        capture_output=True, text=True, check=True)
    zpath = r.stdout.strip()
    inp = tmp_path / "in"
    inp.mkdir()
    # pages-shaped input: generate a tiny batch with the fixture generator
    sys.path.insert(0, str(ROOT))
    from ksana_corpus_builder_spark.sources.pages import make_pages_pdf
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(make_pages_pdf(60)),
                   inp / "batch0.parquet",
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    out = tmp_path / "out"
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zpath,
         str(ROOT / "jobs" / "quality_filter_job.py"),
         "--input", str(inp), "--output", str(out), "--buckets", "2"],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["n_docs"] == 60
    assert (out / "labels").exists() and (out / "metrics").exists()
