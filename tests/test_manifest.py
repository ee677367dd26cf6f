"""Resumability tests (FIXTURES.md §4): run, drop one partition's lineage,
rerun → only that partition recomputed; changed spec invalidates all."""

import os

from boon_spark.sources.manifest import (ValidationManifest, spec_hash,
                                         validate_partitioned)

SPEC = {"properties": {"n_tok": {"minimum": 1, "maximum": 100}}}


def _df(spark):
    rows = [(f"d{i}", i % 150 + 1, ["web", "books", "code"][i % 3])
            for i in range(300)]
    return spark.createDataFrame(rows, "doc_id string, n_tok int, source string")


def test_first_run_validates_all(spark, tmp_path):
    out = validate_partitioned(spark, _df(spark), SPEC, "source",
                               str(tmp_path / "manifest"),
                               violations_path=str(tmp_path / "viols"),
                               row_id="doc_id")
    assert sorted(out["pending"]) == ["books", "code", "web"]
    assert out["skipped"] == []
    assert all(m["n_rows"] == 100 for m in out["metrics"].values())
    assert all(m["n_invalid"] > 0 for m in out["metrics"].values())
    # violations written partitioned by source
    assert os.path.isdir(tmp_path / "viols" / "source=web")


def test_rerun_skips_everything(spark, tmp_path):
    df = _df(spark)
    validate_partitioned(spark, df, SPEC, "source",
                         str(tmp_path / "m"), row_id="doc_id")
    out2 = validate_partitioned(spark, df, SPEC, "source",
                                str(tmp_path / "m"), row_id="doc_id")
    assert out2["pending"] == []
    assert sorted(out2["skipped"]) == ["books", "code", "web"]


def test_invalidate_recomputes_only_that_partition(spark, tmp_path):
    df = _df(spark)
    mpath = str(tmp_path / "m")
    validate_partitioned(spark, df, SPEC, "source", mpath, row_id="doc_id")
    ValidationManifest(mpath).invalidate("books")
    out = validate_partitioned(spark, df, SPEC, "source", mpath,
                               row_id="doc_id")
    assert out["pending"] == ["books"]
    assert sorted(out["skipped"]) == ["code", "web"]
    assert list(out["metrics"]) == ["books"]


def test_changed_spec_invalidates_lineage(spark, tmp_path):
    df = _df(spark)
    mpath = str(tmp_path / "m")
    validate_partitioned(spark, df, SPEC, "source", mpath, row_id="doc_id")
    spec2 = {"properties": {"n_tok": {"minimum": 1, "maximum": 50}}}
    assert spec_hash(spec2) != spec_hash(SPEC)
    out = validate_partitioned(spark, df, spec2, "source", mpath,
                               row_id="doc_id")
    assert sorted(out["pending"]) == ["books", "code", "web"]


def test_manifest_entries_carry_metrics(spark, tmp_path):
    mpath = str(tmp_path / "m")
    validate_partitioned(spark, _df(spark), SPEC, "source", mpath,
                         row_id="doc_id")
    entries = ValidationManifest(mpath).entries()
    assert len(entries) == 3
    e = entries[0]
    assert e["status"] == "complete" and e["n_rows"] == 100
    assert e["spec_hash"] == spec_hash(SPEC)


def test_partition_cardinality_guard(spark, tmp_path):
    # a high-cardinality "partition" column must fail loudly instead of
    # collecting millions of distinct values onto the driver
    import pytest
    from pyspark.sql import functions as F
    from boon_spark.sources.manifest import validate_partitioned
    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.col("id").alias("p"))
    with pytest.raises(ValueError, match="distinct values"):
        validate_partitioned(spark, df, {"properties": {}}, "p",
                             str(tmp_path / "m"), max_partitions=10)
