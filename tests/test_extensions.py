"""Extension-surface tests: register_format / register_content_encoding /
register_content_media_type (boon tests/examples.rs:124-230 parity),
$anchor resolution, and http(s) schema loading."""

import json
import threading

import pytest
from pyspark.sql import functions as F

from boon_spark import (Engine, CompileError, register_content_encoding,
                        register_content_media_type, register_format)


def test_register_format_column_expr(spark):
    register_format("even-length", lambda c: F.length(c) % 2 == 0,
                    column_expr=True)
    eng = Engine.from_schema({"properties": {"s": {"format": "even-length"}}})
    df = spark.createDataFrame([("ab",), ("abc",)], "s string")
    got = [r.valid for r in eng.annotate(df).collect()]
    assert got == [True, False]


def test_register_format_vectorized_python(spark):
    register_format("palindrome", lambda s: s == s[::-1])
    eng = Engine.from_schema({"properties": {"s": {"format": "palindrome"}}})
    df = spark.createDataFrame([("aba",), ("abc",)], "s string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, False]


def test_register_content_encoding(spark):
    # hex encoding, like boon's example (tests/examples.rs:158-200)
    register_content_encoding(
        "hex", lambda c: F.try_to_binary(c, F.lit("hex")).cast("string"))
    eng = Engine.from_schema(
        {"properties": {"b": {"contentEncoding": "hex"}}})
    df = spark.createDataFrame([("deadbeef",), ("xyz",)], "b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, False]


def test_register_content_media_type(spark):
    register_content_media_type(
        "text/csv", lambda c: F.size(F.split(c, ",")) >= 2)
    eng = Engine.from_schema(
        {"properties": {"b": {"contentMediaType": "text/csv"}}})
    df = spark.createDataFrame([("a,b,c",), ("nocommas",)], "b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, False]


def test_unknown_encoding_is_compile_error(spark):
    eng = Engine.from_schema(
        {"properties": {"b": {"contentEncoding": "rot13"}}})
    df = spark.createDataFrame([("x",)], "b string")
    with pytest.raises(CompileError, match="register_content_encoding"):
        eng.annotate(df)


def test_unknown_format_is_compile_error():
    # fail-fast at compile (boon ignores unknown formats as annotations,
    # compiler.rs:488-502; we assert formats, so unknown must error
    # cleanly — a raw KeyError would bypass the CLI's CompileError handler)
    with pytest.raises(CompileError, match="register_format"):
        Engine.from_schema({"properties": {"x": {"format": "iri-x"}}})


def test_anchor_resolution(spark):
    eng = Engine.from_schema({
        "$defs": {"pos": {"$anchor": "positive", "minimum": 0}},
        "properties": {"x": {"$ref": "#positive"}},
    })
    df = spark.createDataFrame([(1,), (-1,)], "x int")
    assert [r.valid for r in eng.annotate(df).collect()] == [True, False]


def test_http_schema_loading(tmp_path):
    import http.server
    import socketserver

    from boon_spark.cli import load_schema

    doc = {"properties": {"x": {"minimum": 0}}}
    (tmp_path / "s.json").write_text(json.dumps(doc))

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        got = load_schema(f"http://127.0.0.1:{port}/s.json")
        srv.shutdown()
    assert got == doc


def test_unevaluated_with_dynamic_applicator(spark):
    # round 1 rejected this shape at compile; round 2 implements the
    # runtime annotation flow (boon's Uneval merge,
    # validator.rs:930-968) — `a` is evaluated by the anyOf branch iff
    # the branch validates, so only `b` is unevaluated
    from boon_spark import Engine
    eng = Engine.from_schema({
        "anyOf": [{"properties": {"a": {"type": "string"}}}],
        "unevaluatedProperties": False})
    df = spark.createDataFrame([("x", "y"), ("x", None)],
                               "a string, b string")
    assert [r.valid for r in eng.annotate(df).collect()] == [False, True]
