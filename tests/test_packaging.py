"""Deployment contract: the package zips and runs via
``spark-submit --py-files`` from OUTSIDE the repo (north_rule shape)."""

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path, spark):
    # build the zip
    subprocess.run(["sh", os.path.join(REPO, "package.sh")], check=True,
                   capture_output=True, timeout=120)
    zip_path = os.path.join(REPO, "dist", "boon_spark.zip")
    assert os.path.exists(zip_path)

    # a tiny sequences-shaped table with one violation
    from boon_spark.sources.tables import synthetic_sequences
    p = str(tmp_path / "seq.parquet")
    synthetic_sequences(spark, 3000, partitions=2).write.parquet(p)

    r = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "validate_job.py"), "--table", p],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path))  # NOT the repo — only the zip provides the pkg
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON output; stderr tail: {r.stderr[-500:]}"
    out = json.loads(lines[-1])
    assert out["n_rows"] == 3000
    assert out["valid"] is False and r.returncode == 2
