"""format / content* assertion-mode parity with boon
(``enable_format_assertions`` / ``enable_content_assertions``,
``src/compiler.rs:105-130``; CLI ``--assert-format`` / ``--assert-content``,
``cli/src/main.rs:70-97,193-201``).

Defaults:
* ``format``: asserts in drafts <= 7; annotation-only in 2019-09/2020-12
  (and in permissive no-$schema mode, which follows boon's default draft)
  unless enabled or the metaschema requires the format(-assertion) vocab;
* ``contentEncoding``/``contentMediaType``/``contentSchema``:
  annotation-only in every draft unless enabled.
"""

import pytest

from boon_spark import CompileError, Engine

D7 = "http://json-schema.org/draft-07/schema#"
D2020 = "https://json-schema.org/draft/2020-12/schema"


def _valids(spark, schema, rows, ddl, **kw):
    eng = Engine.from_schema(schema, **kw)
    df = spark.createDataFrame(rows, ddl)
    return [r.valid for r in eng.annotate(df).collect()]


BAD_DATE = [("2024-01-15",), ("not-a-date",)]


def test_format_annotation_by_default_no_schema(spark):
    # permissive mode (no $schema) follows boon's default draft 2020-12:
    # format is an annotation — the malformed date passes
    got = _valids(spark, {"properties": {"d": {"format": "date"}}},
                  BAD_DATE, "d string")
    assert got == [True, True]


def test_format_asserts_when_enabled(spark):
    got = _valids(spark, {"properties": {"d": {"format": "date"}}},
                  BAD_DATE, "d string", assert_format=True)
    assert got == [True, False]


def test_format_asserts_by_default_in_draft7(spark):
    got = _valids(spark, {"$schema": D7,
                          "properties": {"d": {"format": "date"}}},
                  BAD_DATE, "d string")
    assert got == [True, False]


def test_format_annotation_by_default_in_2020(spark):
    got = _valids(spark, {"$schema": D2020,
                          "properties": {"d": {"format": "date"}}},
                  BAD_DATE, "d string")
    assert got == [True, True]


def test_format_asserts_under_format_assertion_vocab(spark):
    # a custom 2020-12 metaschema marking the format-assertion vocabulary
    # REQUIRED turns assertions on without the flag (compiler.rs:488-494)
    meta_uri = "https://example.com/meta/format-on"
    # applicator must be required too — vocabulary gating (r3) otherwise
    # disables `properties` itself, exactly like boon's has_vocab
    meta = {"$schema": D2020,
            "$vocabulary": {
                "https://json-schema.org/draft/2020-12/vocab/core": True,
                "https://json-schema.org/draft/2020-12/vocab/applicator":
                    True,
                "https://json-schema.org/draft/2020-12/vocab/validation":
                    True,
                "https://json-schema.org/draft/2020-12/vocab/"
                "format-assertion": True}}
    got = _valids(spark, {"$schema": meta_uri,
                          "properties": {"d": {"format": "date"}}},
                  BAD_DATE, "d string", resources={meta_uri: meta})
    assert got == [True, False]


def test_unknown_format_ok_when_annotation_only():
    # annotation mode never consults the registry (boon skips compile,
    # compiler.rs:488-502); asserting mode fail-fasts
    Engine.from_schema({"properties": {"x": {"format": "no-such"}}})
    with pytest.raises(CompileError, match="register_format"):
        Engine.from_schema({"properties": {"x": {"format": "no-such"}}},
                           assert_format=True)


def test_format_shape_checked_in_both_modes():
    with pytest.raises(CompileError, match="format: expected string"):
        Engine.from_schema({"properties": {"x": {"format": 7}}})


BAD_B64 = [("aGk=",), ("!!!",)]


def test_content_encoding_annotation_by_default(spark):
    schema = {"properties": {"b": {"contentEncoding": "base64"}}}
    assert _valids(spark, schema, BAD_B64, "b string") == [True, True]
    assert _valids(spark, schema, BAD_B64, "b string",
                   assert_content=True) == [True, False]


def test_content_annotation_even_in_draft7(spark):
    # boon: content assertions are "always disabled" by default, every
    # draft (compiler.rs:122-130) — unlike format there is no draft<=7
    # assert default
    schema = {"$schema": D7,
              "properties": {"b": {"contentEncoding": "base64"}}}
    assert _valids(spark, schema, BAD_B64, "b string") == [True, True]


def test_content_schema_annotation_by_default(spark):
    schema = {"properties": {"p": {
        "contentMediaType": "application/json",
        "contentSchema": {"properties": {"k": {"type": "integer"}},
                          "required": ["k"]}}}}
    rows = [('{"k": 1}',), ("not json",)]
    assert _valids(spark, schema, rows, "p string") == [True, True]
    assert _valids(spark, schema, rows, "p string",
                   assert_content=True) == [True, False]


def test_spec_level_inline_opt_in(spark):
    # a table-spec dict can opt in inline — this is how specs flow
    # through validate_table / manifests / streaming unchanged
    spec = {"schema": {"properties": {"d": {"format": "date"}}},
            "assert_format": True}
    got = _valids(spark, spec, BAD_DATE, "d string")
    assert got == [True, False]
