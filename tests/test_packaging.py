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


def test_coverage_header_matches_gate_count():
    # commit-message/doc gate totals drifted twice in r5; pin the
    # COVERAGE.md header to the one source of truth: len(queries())
    import os
    import re
    import __spark_entry__ as e
    n = len(e.queries())
    assert len(e.oracle_sql()) == n, "every gate must be oracle-paired"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    head = open(os.path.join(root, "COVERAGE.md")).read()[:400]
    m = re.search(r"(\d+) gate\nqueries, \*\*(\d+)/(\d+) DuckDB", head)
    assert m, "COVERAGE.md header count not found"
    assert {int(g) for g in m.groups()} == {n}, (m.groups(), n)
