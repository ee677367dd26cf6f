"""Metaschema-shape validation of schema documents (boon validates each
schema against its draft metaschema before compiling,
src/roots.rs:86-94): malformed keyword payloads must fail at compile
with a precise keyword-naming message, never a raw
TypeError/AttributeError mid-compile."""

import pytest

from boon_spark import CompileError
from boon_spark.schema import compile_schema


@pytest.mark.parametrize("doc,match", [
    ({"properties": {"a": {"required": {"b": True}}}},
     r"required: expected array of strings, got object"),
    ({"properties": {"a": {"required": [1, 2]}}},
     r"required: expected array of strings"),
    ({"properties": ["a"]}, r"properties: expected object"),
    ({"patternProperties": ["^a"]}, r"patternProperties: expected object"),
    ({"properties": {"a": {"uniqueItems": "yes"}}},
     r"uniqueItems: expected boolean, got string"),
    ({"properties": {"a": {"pattern": 5}}},
     r"pattern: expected string \(regex\), got int"),
    ({"properties": {"a": {"$ref": 7}}}, r"\$ref: expected string"),
    ({"dependentRequired": {"a": "b"}},
     r"dependentRequired/a: expected array of strings, got string"),
    ({"dependentRequired": ["a"]}, r"dependentRequired: expected object"),
    ({"properties": {"a": {"contentEncoding": 64}}},
     r"contentEncoding: expected string, got int"),
    ({"properties": {"xs": {"prefixItems": {"0": {}}}}},
     r"prefixItems: expected array of subschemas, got object"),
    ({"properties": {"a": {"minLength": -1}}},
     r"minLength: expected non-negative integer"),
    ({"properties": {"a": {"minimum": "low"}}},
     r"minimum: expected number, got str"),
    ({"properties": {"a": {"enum": []}}}, r"enum: must be a non-empty array"),
    ({"allOf": []}, r"allOf: must be a non-empty array"),
    ({"properties": {"a": {"type": "strng"}}}, r"type: unknown type"),
    ({"properties": {"a": 42}}, r"schema must be boolean or object"),
])
def test_malformed_payloads_fail_precisely(doc, match):
    with pytest.raises(CompileError, match=match):
        compile_schema(doc)


def test_wellformed_still_compiles():
    compile_schema({
        "required": ["a"],
        "properties": {"a": {"type": "string", "pattern": "^x"}},
        "dependentRequired": {"a": ["b"]},
        "patternProperties": {"^n_": {"minimum": 0}},
    })


def test_enum_type_mismatch_is_not_equal_not_crash(spark):
    # heterogeneous enum vs a string column: the int member must be
    # statically NOT-EQUAL, never an ANSI cast crash or a silent pass
    from boon_spark import Engine
    eng = Engine.from_schema({"properties": {"s": {"enum": ["en", 5]}}})
    df = spark.createDataFrame([("en",), ("xx",)], "s string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, False]
    # and the numeric member still matches on a numeric column
    eng2 = Engine.from_schema({"properties": {"n": {"enum": ["en", 5]}}})
    df2 = spark.createDataFrame([(5,), (6,)], "n int")
    assert [r.valid for r in eng2.annotate(df2).collect()] == [True, False]


def test_const_type_mismatch_fails_not_crashes(spark):
    from boon_spark import Engine
    eng = Engine.from_schema({"properties": {"s": {"const": 5}}})
    df = spark.createDataFrame([("xx",), (None,)], "s string")
    assert [r.valid for r in eng.annotate(df).collect()] == [False, True]


def test_empty_dependent_required_list(spark):
    from boon_spark import Engine
    eng = Engine.from_schema({"dependentRequired": {"a": []}})
    df = spark.createDataFrame([("x",)], "a string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


def test_table_spec_with_annotations(spark):
    # a title/description on the wrapper must not demote it to a bare
    # (validate-nothing) schema
    from boon_spark.schema import compile_schema
    c = compile_schema({"title": "My spec", "schema": {
        "properties": {"x": {"minimum": 0}}}, "unique": [["x"]]})
    assert c.unique == [["x"]]
    assert c.root.properties is not None
