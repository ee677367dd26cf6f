"""ECMA-262 → Java regex translation unit tests, mirroring the
reference translator's own cases (boon ``src/ecma.rs:155-197``) plus the
Java-specific anchor handling.  Behavior-through-rlike coverage lives in
tests/fixtures/ecma_regex.json."""

import pytest

from boon_spark.errors import CompileError
from boon_spark.functions.ecma import translate


@pytest.mark.parametrize("src,want_java", [
    # mirrors ecma.rs test_ecma_compat_valid (translated for Java)
    (r"ab\cAcde\cBfg", "ab\\x01cde\\x02fg"),   # \c{control_letter}
    (r"\\comment", r"\\comment"),              # escaped backslash, no \c
    (r"ab\def", "ab[0-9]ef"),                  # \d
    (r"ab[a-z\d]ef", "ab[a-z0-9]ef"),          # \d inside a class
    (r"ab\Def", "ab[^0-9]ef"),                 # \D
    (r"a\wb", "a[A-Za-z0-9_]b"),               # \w
    (r"a\Wb", "a[^A-Za-z0-9_]b"),              # \W
    (r"^x$", "\\Ax\\z"),                       # ECMA anchors → \A/\z
    (r"[^x$]", "[^x$]"),                       # $ literal inside class
    (r"a\$b", "a\\$b"),                        # escaped $ untouched
])
def test_translate_java(src, want_java):
    java, _py = translate(src)
    assert java == want_java


def test_python_probe_uses_big_z():
    java, py = translate(r"^x$")
    assert java.endswith("\\z") and py.endswith("\\Z")


@pytest.mark.parametrize("src", [
    r"\c\n",       # \c{invalid_char} (ecma.rs test_ecma_compat_invalid)
    r"abc\adef",   # \a is not an ECMA escape
    r"[a-z\D]",    # negated perl class inside a class: not portable
    r"[\S]",
])
def test_translate_rejects(src):
    with pytest.raises(CompileError):
        translate(src)


def test_compile_integrates_translation():
    from boon_spark.schema import compile_schema
    n = compile_schema({"properties": {"s": {"pattern": r"^a\sb$"}}})
    node = n.root.properties["s"]
    assert node.pattern.startswith("\\Aa[")
    assert node.pattern_src == r"^a\sb$"


@pytest.mark.parametrize("src,want_java", [
    # class-internal constructs where Java diverges from ECMA
    (r"[[]", r"[\[]"),            # literal '[' in class: Java would throw
    (r"[a&&b]", r"[a\&\&b]"),     # '&&' is Java class INTERSECTION
    (r"a{2", r"a\{2"),            # dangling '{': Java 'Unclosed counted closure'
    (r"a{2}", r"a{2}"),           # real quantifiers untouched
    (r"a{2,}b{1,3}", r"a{2,}b{1,3}"),
    (r"[{]", r"[{]"),             # '{' inside class is literal in both
])
def test_translate_java_class_escapes(src, want_java):
    java, py = translate(src)
    assert java == want_java
    import re
    re.compile(py)  # probe stays Python-valid
