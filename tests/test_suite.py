"""Fixture-driven conformance suite, mirroring the reference's
golden-suite strategy (boon ``tests/suite.rs:27-106``): JSON files of
``[{description, ddl, schema, tests: [{description, data, valid}]}]``;
the assertion is exactly ``row.valid == test.valid``
(``tests/suite.rs:102``).

Each group becomes ONE DataFrame (all test rows) validated in ONE pass —
the engine's single-projection design makes per-row assertions cheap.
"""

import json
import os
from glob import glob

import pytest

from boon_spark import Engine

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_groups():
    out = []
    for path in sorted(glob(os.path.join(FIXTURE_DIR, "*.json"))):
        with open(path) as f:
            groups = json.load(f)
        for g in groups:
            out.append(pytest.param(
                g, id=f"{os.path.basename(path)}::{g['description']}"))
    return out


GROUPS = _load_groups()


@pytest.mark.parametrize("group", GROUPS)
def test_fixture_group(spark, group):
    from pyspark.sql.types import (ArrayType, DoubleType, FloatType,
                                   _parse_datatype_string)
    schema = _parse_datatype_string(group["ddl"])

    def coerce(v, dt):
        # JSON 2 and 2.0 are the same number (boon src/util.rs:347);
        # pyspark's strict ingestion needs the float spelled out
        if v is None:
            return None
        if isinstance(dt, (DoubleType, FloatType)) and isinstance(v, int):
            return float(v)
        if isinstance(dt, ArrayType) and isinstance(v, list):
            return [coerce(x, dt.elementType) for x in v]
        return v

    rows = [t["data"] for t in group["tests"]]
    df = spark.createDataFrame(
        [tuple(coerce(r.get(f.name), f.dataType) for f in schema.fields)
         for r in rows],
        schema)
    # assertion modes default ON here (like boon's suite runner,
    # tests/suite.rs:85-86); a group can pin either mode explicitly
    eng = Engine.from_schema(
        group["schema"],
        assert_format=group.get("assert_format", True),
        assert_content=group.get("assert_content", True))
    got = [r["valid"] for r in eng.annotate(df).select("valid").collect()]
    want = [t["valid"] for t in group["tests"]]
    for g_, w_, t in zip(got, want, group["tests"]):
        assert g_ == w_, (
            f"{group['description']} :: {t['description']}: "
            f"expected valid={w_}, got {g_} for data={t['data']}")
