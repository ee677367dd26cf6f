"""Property-based testing (hypothesis): random constraint specs × random
rows (with NULLs everywhere) compared against an independent pure-Python
evaluator of the documented semantics.

The reference's suite is golden-file-driven (SURVEY §5); this adds the
randomized layer it lacks, specifically to hunt three-valued-logic bugs
(SQL NULL propagation) in the expression builder.
"""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from boon_spark import Engine

# ---------------------------------------------------------------------------
# independent evaluator of the engine's documented semantics
# ---------------------------------------------------------------------------


def eval_value(schema: dict, v, *, is_int_col: bool) -> bool:
    """Value-level keywords with NULL-passes-everything-but-type rules."""
    ok = True
    if "type" in schema:
        want = schema["type"] if isinstance(schema["type"], list) \
            else [schema["type"]]
        if v is None:
            ok &= "null" in want
        elif isinstance(v, list):
            ok &= "array" in want
        elif isinstance(v, str):
            ok &= "string" in want
        elif is_int_col or (isinstance(v, float) and v == int(v)):
            ok &= bool({"integer", "number"} & set(want))
        else:
            ok &= "number" in want
    if v is None:
        # type-specific keywords pass on NULL, but LOGIC applicators
        # still evaluate (JSON-null semantics: not({minimum}) FAILS null
        # because the inner schema passes it)
        if "anyOf" in schema:
            ok &= any(eval_value(s, None, is_int_col=is_int_col)
                      for s in schema["anyOf"])
        if "not" in schema:
            ok &= not eval_value(schema["not"], None, is_int_col=is_int_col)
        return bool(ok)
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        if "minimum" in schema:
            ok &= v >= schema["minimum"]
        if "maximum" in schema:
            ok &= v <= schema["maximum"]
        if "exclusiveMinimum" in schema and not isinstance(
                schema["exclusiveMinimum"], bool):
            ok &= v > schema["exclusiveMinimum"]
        if "multipleOf" in schema:
            m = schema["multipleOf"]
            ok &= (float(v) / m) == int(float(v) / m)
    if isinstance(v, str):
        if "minLength" in schema:
            ok &= len(v) >= schema["minLength"]
        if "maxLength" in schema:
            ok &= len(v) <= schema["maxLength"]
        if "pattern" in schema:
            ok &= re.search(schema["pattern"], v) is not None
    if "enum" in schema:
        ok &= any(_jeq(v, e) for e in schema["enum"])
    if "const" in schema:
        ok &= _jeq(v, schema["const"])
    if isinstance(v, list):
        if "minItems" in schema:
            ok &= len(v) >= schema["minItems"]
        if "maxItems" in schema:
            ok &= len(v) <= schema["maxItems"]
        if schema.get("uniqueItems"):
            ok &= len(set(v)) == len(v)
        if "items" in schema:
            ok &= all(eval_value(schema["items"], x, is_int_col=True)
                      for x in v)
        if "contains" in schema:
            cnt = sum(bool(eval_value(schema["contains"], x,
                                      is_int_col=True)) for x in v)
            ok &= cnt >= 1
    for sub in schema.get("anyOf", []) or []:
        pass
    if "anyOf" in schema:
        ok &= any(eval_value(s, v, is_int_col=is_int_col)
                  for s in schema["anyOf"])
    if "not" in schema:
        ok &= not eval_value(schema["not"], v, is_int_col=is_int_col)
    return bool(ok)


def _jeq(a, b):
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


def eval_row(spec: dict, row: dict, int_cols: set) -> bool:
    ok = True
    for r in spec.get("required", []):
        ok &= row.get(r) is not None
    for name, sub in spec.get("properties", {}).items():
        ok &= eval_value(sub, row.get(name), is_int_col=name in int_cols)
    return bool(ok)


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

num_kw = st.fixed_dictionaries({}, optional={
    "minimum": st.integers(-5, 5),
    "maximum": st.integers(-5, 10),
    "multipleOf": st.sampled_from([1, 2, 3]),
    "type": st.sampled_from(["integer", ["integer", "null"], "number"]),
    "anyOf": st.tuples(st.integers(-5, 0), st.integers(1, 6)).map(
        lambda t: [{"maximum": t[0]}, {"minimum": t[1]}]),
    "not": st.integers(-3, 3).map(lambda b: {"minimum": b}),
})

str_kw = st.fixed_dictionaries({}, optional={
    "minLength": st.integers(0, 4),
    "maxLength": st.integers(0, 6),
    "pattern": st.sampled_from(["^a", "b$", "c", "^[ab]+$"]),
    "enum": st.lists(st.sampled_from(["a", "ab", "abc", "b", "c"]),
                     min_size=1, max_size=3, unique=True),
    "const": st.sampled_from(["a", "ab"]),
    "type": st.sampled_from(["string", ["string", "null"]]),
})

arr_kw = st.fixed_dictionaries({}, optional={
    "minItems": st.integers(0, 3),
    "maxItems": st.integers(1, 5),
    "uniqueItems": st.booleans(),
    "items": st.fixed_dictionaries({}, optional={
        "minimum": st.integers(-3, 2), "maximum": st.integers(0, 8)}),
    "contains": st.fixed_dictionaries({"minimum": st.integers(0, 5)}),
})

spec_st = st.fixed_dictionaries({
    "properties": st.fixed_dictionaries({}, optional={
        "n": num_kw, "s": str_kw, "xs": arr_kw}),
}, optional={"required": st.lists(
    st.sampled_from(["n", "s", "xs"]), unique=True)})

row_st = st.fixed_dictionaries({
    "k": st.integers(0, 10**6),
    "n": st.one_of(st.none(), st.integers(-8, 12)),
    "s": st.one_of(st.none(),
                   st.text(alphabet="abc", min_size=0, max_size=7)),
    "xs": st.one_of(st.none(), st.lists(st.integers(-4, 9), max_size=6)),
})


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(spec=spec_st, rows=st.lists(row_st, min_size=1, max_size=8))
def test_engine_matches_python_evaluator(_spark, spec, rows):
    df = _spark.createDataFrame(
        [(r["k"], r["n"], r["s"], r["xs"]) for r in rows],
        "k bigint, n bigint, s string, xs array<bigint>")
    eng = Engine.from_schema(spec, row_id="k")
    got = [r.valid for r in eng.annotate(df).select("valid").collect()]
    want = [eval_row(spec, r, int_cols={"n", "xs"}) for r in rows]
    assert got == want, f"spec={spec} rows={rows}"


# ---------------------------------------------------------------------------
# dynamic unevaluatedProperties (runtime annotation flow, round 2)
# ---------------------------------------------------------------------------

def _branch_valid(sub: dict, row: dict) -> bool:
    ok = True
    for r in sub.get("required", []):
        ok &= row.get(r) is not None
    for nm, s in sub.get("properties", {}).items():
        ok &= eval_value(s, row.get(nm), is_int_col=(nm == "n"))
    return bool(ok)


def eval_uneval_row(spec: dict, row: dict) -> bool:
    """Independent evaluator of 2020-12 annotation semantics: a branch
    contributes its evaluated names iff the branch validates."""
    valid = True
    evaluated = set(spec.get("properties", {}))
    for nm, s in spec.get("properties", {}).items():
        valid &= eval_value(s, row.get(nm), is_int_col=(nm == "n"))
    for comb in ("anyOf", "oneOf"):
        if comb in spec:
            bvs = [_branch_valid(b, row) for b in spec[comb]]
            valid &= any(bvs) if comb == "anyOf" else (sum(bvs) == 1)
            for b, bv in zip(spec[comb], bvs):
                if bv:
                    evaluated |= set(b.get("properties", {}))
    if "if" in spec:
        cond = _branch_valid(spec["if"], row)
        if cond:
            evaluated |= set(spec["if"].get("properties", {}))
            if "then" in spec:
                tv = _branch_valid(spec["then"], row)
                valid &= tv
                if tv:
                    evaluated |= set(spec["then"].get("properties", {}))
        elif "else" in spec:
            ev = _branch_valid(spec["else"], row)
            valid &= ev
            if ev:
                evaluated |= set(spec["else"].get("properties", {}))
    u = spec["unevaluatedProperties"]
    # every DataFrame column is a property of the row object — including
    # the row-id column k (always present, so always subject to uneval)
    for nm in ("k", "a", "b", "n"):
        if nm in evaluated or row.get(nm) is None:
            continue  # evaluated, or absent (SQL NULL = absent)
        if u is False:
            valid = False
        else:
            valid &= eval_value(u, row.get(nm),
                                is_int_col=nm in ("k", "n"))
    return bool(valid)


_branch_st = st.fixed_dictionaries({}, optional={
    "properties": st.fixed_dictionaries({}, optional={
        "a": st.sampled_from([{"const": "x"}, {"minLength": 1}, {}]),
        "b": st.sampled_from([{"const": "y"}, {"maxLength": 2}, {}]),
        "n": st.sampled_from([{"minimum": 0}, {"maximum": 5}, {}]),
    }),
    "required": st.lists(st.sampled_from(["a", "b", "n"]), unique=True),
})

uneval_spec_st = st.fixed_dictionaries({
    "unevaluatedProperties": st.sampled_from([False, {"maximum": 3},
                                              {"minLength": 2}]),
}, optional={
    "properties": st.fixed_dictionaries({}, optional={
        "a": st.sampled_from([{"minLength": 0}, {}])}),
    "anyOf": st.lists(_branch_st, min_size=1, max_size=2),
    "oneOf": st.lists(_branch_st, min_size=1, max_size=2),
    "if": _branch_st,
    "then": _branch_st,
    "else": _branch_st,
})

uneval_row_st = st.fixed_dictionaries({
    "k": st.integers(0, 10**6),
    "a": st.one_of(st.none(), st.sampled_from(["x", "xx", "q"])),
    "b": st.one_of(st.none(), st.sampled_from(["y", "yyy", ""])),
    "n": st.one_of(st.none(), st.integers(-3, 8)),
})


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(spec=uneval_spec_st, rows=st.lists(uneval_row_st, min_size=1,
                                          max_size=6))
def test_dynamic_unevaluated_matches_python_evaluator(_spark, spec, rows):
    df = _spark.createDataFrame(
        [(r["k"], r["a"], r["b"], r["n"]) for r in rows],
        "k bigint, a string, b string, n bigint")
    eng = Engine.from_schema(spec, row_id="k")
    got = [r.valid for r in eng.annotate(df).select("valid").collect()]
    want = [eval_uneval_row(spec, r) for r in rows]
    assert got == want, f"spec={spec} rows={rows}"


# ---------------------------------------------------------------------------
# recursive $ref unrolling (round 3): the SAME subschema applies at every
# nesting level; the engine's type-directed unroller must agree with a
# straight recursive Python evaluator on every depth
# ---------------------------------------------------------------------------

def eval_tree(node_schema: dict, val) -> bool:
    """Recursive evaluation of {"v": ..., "child": {...}} trees where
    the child keyword re-applies node_schema (NULL semantics as above)."""
    if val is None:
        return True
    v = val[0]
    child = val[1] if len(val) > 1 else None
    ok = True
    vs = node_schema["properties"]["v"]
    if v is not None:
        if "minimum" in vs:
            ok &= v >= vs["minimum"]
        if "maximum" in vs:
            ok &= v <= vs["maximum"]
    req = node_schema.get("required", [])
    if "v" in req:
        ok &= v is not None
    return bool(ok) and eval_tree(node_schema, child)


tree_node_st = st.fixed_dictionaries({
    "properties": st.fixed_dictionaries({
        "v": st.fixed_dictionaries({}, optional={
            "minimum": st.integers(-4, 2),
            "maximum": st.integers(-1, 6)}),
    }),
}, optional={"required": st.sampled_from([["v"]])})

_leaf = st.one_of(st.none(), st.tuples(
    st.one_of(st.none(), st.integers(-6, 8))))
_mid = st.one_of(st.none(), st.tuples(
    st.one_of(st.none(), st.integers(-6, 8)), _leaf))
tree_val_st = st.one_of(st.none(), st.tuples(
    st.one_of(st.none(), st.integers(-6, 8)), _mid))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(node=tree_node_st,
       rows=st.lists(tree_val_st, min_size=1, max_size=6))
def test_recursive_ref_matches_python_evaluator(_spark, node, rows):
    schema = {"$defs": {"node": dict(
        node, properties=dict(node["properties"],
                              child={"$ref": "#/$defs/node"}))},
        "properties": {"t": {"$ref": "#/$defs/node"}}}
    ddl = ("k bigint, t struct<v:bigint,child:struct<v:bigint,"
           "child:struct<v:bigint>>>")
    # pad 2-tuples at the leaf level (struct<v> has no child field)
    df = _spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], ddl)
    eng = Engine.from_schema(schema, row_id="k")
    got = [r.valid for r in eng.annotate(df).select("valid").collect()]
    want = [eval_tree(schema["$defs"]["node"], r) for r in rows]
    assert got == want, f"node={node} rows={rows}"


# ---------------------------------------------------------------------------
# draft dispatch (round 4): a keyword a draft does not define must behave
# exactly as if it were deleted from the schema
# ---------------------------------------------------------------------------

# INDEPENDENT gating tables (not imported from boon_spark.schema — that
# would fuzz the engine against itself), written from the specs/boon
# draft.rs:202-235
_INTRO = {"const": 6, "contains": 6, "dependentRequired": 2019}
# boon compiles `dependencies` in EVERY draft (compile_draft4 runs
# unconditionally, reference compiler.rs:400-414) — nothing in this
# keyword set is removed by a later draft
_REMOVED = {}
_DRAFT_URI = {
    4: "http://json-schema.org/draft-04/schema#",
    6: "http://json-schema.org/draft-06/schema#",
    7: "http://json-schema.org/draft-07/schema#",
    2019: "https://json-schema.org/draft/2019-09/schema",
    2020: "https://json-schema.org/draft/2020-12/schema",
}


def _strip_for_draft(schema, draft):
    if isinstance(schema, list):
        return [_strip_for_draft(s, draft) for s in schema]
    if not isinstance(schema, dict):
        return schema
    out = {}
    for kw, v in schema.items():
        if _INTRO.get(kw, 4) > draft:
            continue
        if kw in _REMOVED and draft >= _REMOVED[kw]:
            continue
        if kw == "properties":
            out[kw] = {k: _strip_for_draft(s, draft) for k, s in v.items()}
        elif kw in ("items", "contains", "not", "anyOf"):
            out[kw] = _strip_for_draft(v, draft)
        else:
            out[kw] = v
    return out


_dep_st = st.fixed_dictionaries({}, optional={
    "n": st.lists(st.sampled_from(["s", "xs"]), min_size=1, max_size=2,
                  unique=True),
    "s": st.lists(st.sampled_from(["n"]), min_size=1, max_size=1),
})

dd_spec_st = st.fixed_dictionaries({
    "properties": st.fixed_dictionaries({}, optional={
        "n": num_kw, "s": str_kw, "xs": arr_kw}),
}, optional={
    "required": st.lists(st.sampled_from(["n", "s", "xs"]), unique=True),
    "dependentRequired": _dep_st,
    "dependencies": _dep_st,
})


def _eval_row_dd(spec, row):
    ok = eval_row(spec, row, int_cols={"n", "xs"})
    # both keywords apply independently — a dict.update merge would
    # drop one keyword's requirements for a shared trigger property
    # (exactly the engine bug the boon-parity alignment fixed)
    for kw in ("dependencies", "dependentRequired"):
        for src, reqs in spec.get(kw, {}).items():
            if row.get(src) is not None:
                ok &= all(row.get(r) is not None for r in reqs)
    return bool(ok)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(spec=dd_spec_st, draft=st.sampled_from([4, 6, 7, 2019, 2020]),
       rows=st.lists(row_st, min_size=1, max_size=6))
def test_draft_gating_matches_stripped_schema(_spark, spec, draft, rows):
    df = _spark.createDataFrame(
        [(r["k"], r["n"], r["s"], r["xs"]) for r in rows],
        "k bigint, n bigint, s string, xs array<bigint>")
    eng = Engine.from_schema({"$schema": _DRAFT_URI[draft], **spec},
                             row_id="k")
    got = [r.valid for r in eng.annotate(df).select("valid").collect()]
    stripped = _strip_for_draft(spec, draft)
    want = [_eval_row_dd(stripped, r) for r in rows]
    assert got == want, f"draft={draft} spec={spec} rows={rows}"


# ------------------------------------------------- shingler equivalence (r5)
# word_shingles became an Arrow-batched pandas UDF (the HOF expression
# form runs interpreted, 9x slower); the expression form stays as the
# semantic reference.  Both share JVM-side normalization, so equality
# here pins the Python shingle-assembly against the Column one on
# arbitrary unicode, whitespace soup, and NULLs.

_shingle_text_st = st.one_of(
    st.none(),
    st.text(alphabet=st.sampled_from(list("ab \t\n\r\x0b\f")), max_size=40),
    st.text(max_size=60),
    st.lists(st.sampled_from(["word", "WORD", "w0rd", "ωορδ", "词"]),
             max_size=12).map(" ".join))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(texts=st.lists(_shingle_text_st, min_size=1, max_size=12),
       n=st.integers(min_value=1, max_value=5))
def test_word_shingles_pandas_matches_expression_fuzz(_spark, texts, n):
    from pyspark.sql import functions as F
    from boon_spark.operators.dedup import word_shingles, word_shingles_expr
    df = _spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {r.i: r.s for r in df.select(
        "i", word_shingles(F.col("text"), n).alias("s")).collect()}
    want = {r.i: r.s for r in df.select(
        "i", word_shingles_expr(F.col("text"), n).alias("s")).collect()}
    assert got == want, f"n={n} texts={texts!r}"
