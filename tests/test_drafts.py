"""Draft dispatch / $vocabulary gating (boon ``src/draft.rs:202-235``
keyword tables, ``427-437`` $schema resolution): a declared ``$schema``
selects the draft, and keywords the draft does not define are ignored as
annotations — exactly what an unknown keyword is in that draft.  Without
``$schema`` the engine stays permissive (union of all drafts)."""

import pytest

from boon_spark import CompileError, Engine
from boon_spark.schema import compile_schema, draft_of_uri

D4 = "http://json-schema.org/draft-04/schema#"
D7 = "http://json-schema.org/draft-07/schema#"
D2019 = "https://json-schema.org/draft/2019-09/schema"
D2020 = "https://json-schema.org/draft/2020-12/schema"


def test_draft_uri_table():
    assert draft_of_uri(D4) == 4
    assert draft_of_uri(D7) == 7
    assert draft_of_uri(D2019) == 2019
    assert draft_of_uri(D2020) == 2020
    assert draft_of_uri("https://example.com/meta") is None


def test_draft7_ignores_2019_keywords(spark):
    # unevaluatedProperties does not exist in draft 7 → plain unknown
    # keyword → annotation, never a failed check
    eng = Engine.from_schema({
        "$schema": D7,
        "properties": {"a": {"type": "string"}},
        "unevaluatedProperties": False})
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


def test_draft4_ignores_const(spark):
    eng = Engine.from_schema({
        "$schema": D4,
        "properties": {"a": {"const": "nope",
                             "exclusiveMinimum": True, "minimum": 5}}})
    df = spark.createDataFrame([(5,), (6,)], "a int")
    # const introduced in draft 6 → ignored; draft-4 boolean
    # exclusiveMinimum folds minimum 5 into a strict bound
    assert [r.valid for r in eng.annotate(df).collect()] == [False, True]


def test_2020_rejects_tuple_items():
    with pytest.raises(CompileError, match="prefixItems"):
        compile_schema({"$schema": D2020,
                        "properties": {"xs": {"items": [{"type": "string"}]}}})


def test_2019_keeps_tuple_items_and_ignores_prefix_items(spark):
    eng = Engine.from_schema({
        "$schema": D2019,
        "properties": {"xs": {"items": [{"const": 1}],
                              "additionalItems": {"minimum": 10}}}})
    df = spark.createDataFrame([([1, 11],), ([1, 2],)], "xs array<int>")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, False]


def test_draft7_ref_replaces_siblings(spark):
    # in draft ≤7, $ref siblings are ignored; 2019+ folds them as allOf
    doc = {"$defs": {"pos": {"minimum": 1}},
           "properties": {"n": {"$ref": "#/$defs/pos", "maximum": 5}}}
    df = spark.createDataFrame([(7,)], "n int")
    d7 = Engine.from_schema({**doc, "$schema": D7})
    assert [r.valid for r in d7.annotate(df).collect()] == [True]
    d2020 = Engine.from_schema({**doc, "$schema": D2020})
    assert [r.valid for r in d2020.annotate(df).collect()] == [False]


def test_permissive_default_accepts_all_drafts(spark):
    # no $schema → union: const (6), if/then (7), unevaluated* (2019),
    # prefixItems (2020) all active at once
    eng = Engine.from_schema({
        "properties": {"a": {"const": "x"},
                       "xs": {"prefixItems": [{"const": 1}]}},
        "unevaluatedProperties": True})
    df = spark.createDataFrame([("x", [1])], "a string, xs array<int>")
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


def test_unknown_metaschema_is_compile_error():
    with pytest.raises(CompileError, match="unknown metaschema"):
        compile_schema({"$schema": "https://example.com/my-meta",
                        "properties": {"a": {"type": "string"}}})


def test_custom_metaschema_inherits_draft_and_checks_vocabulary(spark):
    meta = {"$schema": D7,
            "$vocabulary": {
                "https://json-schema.org/draft/2020-12/vocab/core": True}}
    # NOTE: $vocabulary is only meaningful in 2019+, but boon checks the
    # declared set regardless; the DRAFT comes from the metaschema chain
    eng = Engine.from_schema(
        {"$schema": "https://example.com/meta",
         "properties": {"a": {"type": "string"}},
         "unevaluatedProperties": False},   # draft-7-gated → ignored
        resources={"https://example.com/meta": meta})
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


def test_unsupported_required_vocabulary_is_compile_error():
    meta = {"$schema": D2020,
            "$vocabulary": {"https://example.com/vocab/custom": True}}
    with pytest.raises(CompileError, match="unsupported required vocabulary"):
        compile_schema({"$schema": "https://example.com/meta"},
                       resources={"https://example.com/meta": meta})


def test_optional_vocabulary_is_fine():
    meta = {"$schema": D2020,
            "$vocabulary": {"https://example.com/vocab/custom": False}}
    compile_schema({"$schema": "https://example.com/meta",
                    "properties": {"a": {"type": "string"}}},
                   resources={"https://example.com/meta": meta})


def test_false_valued_known_vocab_gates_group_off(spark):
    # VERDICT r4 #7 / draft.rs:219-233: get_vocabs collects only
    # true-valued entries, so a vocabulary declared FALSE behaves exactly
    # like an absent one — here validation:false turns `minimum` into an
    # annotation while the applicator vocab keeps `properties` working
    V19 = "https://json-schema.org/draft/2019-09/vocab/"
    meta = {"$schema": D2019, "$id": "https://example.com/meta-vf",
            "$vocabulary": {f"{V19}core": True,
                            f"{V19}applicator": True,
                            f"{V19}validation": False}}
    eng = Engine.from_schema(
        {"$schema": "https://example.com/meta-vf",
         "properties": {"n": {"minimum": 5}}},
        resources={"https://example.com/meta-vf": meta})
    df = spark.createDataFrame([(3,), (7,)], "n int")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, True]


def test_assert_format_flag_overrides_false_format_vocab(spark):
    # boon compiler.rs:488-491: format asserts when `assert_format ||
    # has_vocab(...)` — the explicit flag wins even when the metaschema
    # declares the format vocabulary false
    V19 = "https://json-schema.org/draft/2019-09/vocab/"
    meta = {"$schema": D2019, "$id": "https://example.com/meta-ff",
            "$vocabulary": {f"{V19}core": True,
                            f"{V19}applicator": True,
                            f"{V19}validation": True,
                            f"{V19}format": False}}
    resources = {"https://example.com/meta-ff": meta}
    schema = {"$schema": "https://example.com/meta-ff",
              "properties": {"d": {"format": "date"}}}
    df = spark.createDataFrame([("not-a-date",), ("2024-01-01",)],
                               "d string")
    forced = Engine.from_schema(schema, resources=resources,
                                assert_format=True)
    assert [r.valid for r in forced.annotate(df).collect()] == [False, True]
    # without the flag, the false vocab means annotation-only
    plain = Engine.from_schema(schema, resources=resources)
    assert [r.valid for r in plain.annotate(df).collect()] == [True, True]


def test_foreign_resource_uses_its_own_draft(spark):
    # lib declares draft 7 → its unevaluatedProperties is ignored even
    # though the referring root is 2020-12
    lib = {"$id": "https://example.com/lib.json", "$schema": D7,
           "$defs": {"obj": {"properties": {"a": {"type": "string"}},
                             "unevaluatedProperties": False}}}
    eng = Engine.from_schema(
        {"$schema": D2020,
         "$ref": "https://example.com/lib.json#/$defs/obj"},
        resources={"https://example.com/lib.json": lib})
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


# ------------------------------------------------- vocabulary gating (r3)
# boon src/root.rs:16-24 has_vocab + src/draft.rs:202-233 get_vocabs: a
# custom metaschema's required=true vocabularies REPLACE the draft
# defaults; keywords of a disabled vocabulary become plain annotations.

VOCAB_2020 = "https://json-schema.org/draft/2020-12/vocab/"


def _meta(*names, draft=D2020):
    return {"$schema": draft,
            "$vocabulary": {f"{VOCAB_2020}{n}": True for n in names}}


def test_metaschema_without_applicator_disables_properties(spark):
    meta = _meta("core", "validation")
    eng = Engine.from_schema(
        {"$schema": "https://example.com/meta-noapp",
         "type": "object",
         "properties": {"a": {"const": "must"}}},
        resources={"https://example.com/meta-noapp": meta})
    df = spark.createDataFrame([("nope",)], "a string")
    # properties (applicator) is disabled -> the const never applies;
    # type (validation) still asserts
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


def test_metaschema_without_validation_disables_const(spark):
    meta = _meta("core", "applicator")
    eng = Engine.from_schema(
        {"$schema": "https://example.com/meta-noval",
         "properties": {"a": {"const": "must"}}},
        resources={"https://example.com/meta-noval": meta})
    df = spark.createDataFrame([("nope",)], "a string")
    # properties routes the subschema, but const (validation) is off
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


def test_metaschema_without_unevaluated_disables_unevaluated(spark):
    meta = _meta("core", "applicator", "validation")
    eng = Engine.from_schema(
        {"$schema": "https://example.com/meta-nouneval",
         "properties": {"a": {"type": "string"}},
         "unevaluatedProperties": False},
        resources={"https://example.com/meta-nouneval": meta})
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True]


def test_standard_metaschema_keeps_defaults(spark):
    # under the standard 2020-12 metaschema unevaluatedProperties is in
    # the default vocabulary set and must assert
    eng = Engine.from_schema(
        {"$schema": D2020,
         "properties": {"a": {"type": "string"}},
         "unevaluatedProperties": False})
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [False]


def test_wrong_draft_vocab_uri_is_compile_error():
    meta = {"$schema": D2020, "$vocabulary": {
        "https://json-schema.org/draft/2019-09/vocab/applicator": True}}
    with pytest.raises(CompileError, match="unsupported required"):
        compile_schema(
            {"$schema": "https://example.com/meta-wrongdraft",
             "properties": {"a": {"type": "string"}}},
            resources={"https://example.com/meta-wrongdraft": meta})


def test_default_draft_applies_without_schema_uri(spark):
    # boon set_default_draft (src/compiler.rs:99-101): documents without
    # $schema fall back to the configured draft instead of the
    # permissive union
    doc = {"properties": {"xs": {"items": [{"const": 1}]}}}
    # permissive default: draft<=2019 tuple items accepted
    eng = Engine.from_schema(doc)
    df = spark.createDataFrame([([2, 9],)], "xs array<int>")
    assert [r.valid for r in eng.annotate(df).collect()] == [False]
    # default_draft=2020: the array form of items was removed
    with pytest.raises(CompileError, match="prefixItems"):
        compile_schema(doc, default_draft=2020)
    # default_draft=7: 2019-keyword unevaluatedProperties is unknown
    eng7 = Engine.from_schema(
        {"properties": {"a": {"type": "string"}},
         "unevaluatedProperties": False}, default_draft=7)
    df2 = spark.createDataFrame([("x", "y")], "a string, b string")
    assert [r.valid for r in eng7.annotate(df2).collect()] == [True]


def test_default_draft_validated():
    with pytest.raises(CompileError, match="default_draft"):
        compile_schema({"type": "object"}, default_draft=5)


def test_default_draft_does_not_override_declared_draft():
    # a document DECLARING draft-07 keeps it for its embedded resources
    # (boon: one draft per document root; the default is a fallback,
    # not an override) — sixth review pass
    doc = {"$schema": D7, "$id": "http://ex/root",
           "properties": {"a": {"$id": "http://ex/sub",
                                "items": [{"type": "string"}]}}}
    compile_schema(doc, default_draft=2020)  # must NOT reject tuple items


def test_default_draft_inline_spec_key(spark):
    spec = {"schema": {"properties": {"xs": {"items": [{"const": 1}]}}},
            "default_draft": 2020}
    with pytest.raises(CompileError, match="prefixItems"):
        compile_schema(spec)


def test_default_draft_7_asserts_format(spark):
    # default_draft<=7 flips format to asserting for no-$schema docs,
    # exactly like a declared draft-7 $schema
    eng = Engine.from_schema({"properties": {"d": {"format": "date"}}},
                             default_draft=7)
    df = spark.createDataFrame([("2024-01-01",), ("nope",)], "d string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, False]


# ------------------------------------------------- per-draft id model
# boon src/draft.rs:18,46,131 (the `id` field) + collect_anchors:239-297:
# draft-4 spells the resource-id keyword "id"; drafts <2019 declare
# anchors via the id keyword's fragment; $anchor is 2019+.

def test_draft4_id_is_base_uri_and_resource(spark):
    eng = Engine.from_schema({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "id": "http://example.com/d4root.json",
        "definitions": {
            "lib": {"id": "http://example.com/d4lib.json",
                    "definitions": {"pos": {"minimum": 1}}}},
        "properties": {"n": {
            "$ref": "http://example.com/d4lib.json#/definitions/pos"}},
    }, row_id="k")
    df = spark.createDataFrame([("a", 0), ("b", 2)], "k string, n int")
    rows = eng.validate(df).violations().collect()
    assert len(rows) == 1
    assert rows[0].keyword_location == "/properties/n/$ref/minimum"
    assert rows[0].absolute_keyword_location == \
        "http://example.com/d4lib.json#/definitions/pos/minimum"


def test_draft4_id_fragment_is_anchor(spark):
    eng = Engine.from_schema({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "definitions": {"pos": {"id": "#posi", "minimum": 1}},
        "properties": {"n": {"$ref": "#posi"}},
    }, row_id="k")
    df = spark.createDataFrame([("a", 0)], "k string, n int")
    r = eng.validate(df).violations().collect()[0]
    assert r.keyword_location == "/properties/n/$ref/minimum"
    # anchor refs report the anchored subschema's definition pointer
    assert r.absolute_keyword_location == "#/definitions/pos/minimum"


def test_draft6_dollar_id_fragment_is_anchor(spark):
    eng = Engine.from_schema({
        "$schema": "http://json-schema.org/draft-06/schema#",
        "definitions": {"pos": {"$id": "#posi", "minimum": 1}},
        "properties": {"n": {"$ref": "#posi"}},
    }, row_id="k")
    df = spark.createDataFrame([("a", 0)], "k string, n int")
    assert eng.validate(df).violations().count() == 1


def test_draft4_ignores_dollar_id_anchor():
    # "$id" is an unknown keyword in draft 4 — the anchor must not exist
    import pytest as _pytest
    from boon_spark.schema import CompileError
    with _pytest.raises(CompileError, match="posi"):
        Engine.from_schema({
            "$schema": "http://json-schema.org/draft-04/schema#",
            "definitions": {"pos": {"$id": "#posi", "minimum": 1}},
            "properties": {"n": {"$ref": "#posi"}},
        })


def test_draft6_ignores_legacy_id_anchor():
    import pytest as _pytest
    from boon_spark.schema import CompileError
    with _pytest.raises(CompileError, match="posi"):
        Engine.from_schema({
            "$schema": "http://json-schema.org/draft-06/schema#",
            "definitions": {"pos": {"id": "#posi", "minimum": 1}},
            "properties": {"n": {"$ref": "#posi"}},
        })


def test_draft7_ignores_dollar_anchor_keyword():
    # $anchor is 2019+; in draft 7 it is an unknown keyword
    import pytest as _pytest
    from boon_spark.schema import CompileError
    with _pytest.raises(CompileError, match="posi"):
        Engine.from_schema({
            "$schema": "http://json-schema.org/draft-07/schema#",
            "definitions": {"pos": {"$anchor": "posi", "minimum": 1}},
            "properties": {"n": {"$ref": "#posi"}},
        })


def test_legacy_anchor_not_collected_from_ref_object():
    # drafts <2019: an object containing $ref declares no anchor
    # (boon draft.rs:269-271)
    import pytest as _pytest
    from boon_spark.schema import CompileError
    with _pytest.raises(CompileError, match="aa"):
        Engine.from_schema({
            "$schema": "http://json-schema.org/draft-07/schema#",
            "definitions": {
                "pos": {"minimum": 1},
                "alias": {"$id": "#aa", "$ref": "#/definitions/pos"}},
            "properties": {"n": {"$ref": "#aa"}},
        })


def test_draft4_root_id_with_fragment_strips_for_base(spark):
    # the resource id ignores the fragment part (boon draft.rs:198)
    eng = Engine.from_schema({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "id": "http://example.com/d4frag.json#rootanchor",
        "properties": {"n": {"minimum": 1}},
    }, row_id="k")
    df = spark.createDataFrame([("a", 0)], "k string, n int")
    r = eng.validate(df).violations().collect()[0]
    assert r.absolute_keyword_location == \
        "http://example.com/d4frag.json#/properties/n/minimum"


def test_metaschema_without_applicator_disables_dependencies(spark):
    # boon compiles `dependencies` in every draft but inside the
    # applicator vocab block (compiler.rs:357-415): a custom metaschema
    # without the applicator vocabulary disables it
    meta = _meta("core", "validation")
    eng = Engine.from_schema(
        {"$schema": "https://example.com/meta-noapp2",
         "dependencies": {"a": ["b"]},
         "dependentRequired": {"a": ["b"]}},
        resources={"https://example.com/meta-noapp2": meta})
    df = spark.createDataFrame([("x", None)], "a string, b string")
    # dependencies (applicator) disabled; dependentRequired (validation)
    # still asserts -> row invalid through dependentRequired only
    assert [r.valid for r in eng.annotate(df).collect()] == [False]
    eng2 = Engine.from_schema(
        {"$schema": "https://example.com/meta-noapp2",
         "dependencies": {"a": ["b"]}},
        resources={"https://example.com/meta-noapp2": meta})
    assert [r.valid for r in eng2.annotate(df).collect()] == [True]


def test_2019_dependencies_and_recursive_ref_active(spark):
    # reference-parity: both survive into 2019/2020 (compat over spec
    # removal) — asserted here at the API level, fixtures cover dispatch
    eng = Engine.from_schema({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "dependencies": {"a": ["b"]},
    }, row_id="k")
    df = spark.createDataFrame([("r1", "x", None)],
                               "k string, a string, b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [False]
