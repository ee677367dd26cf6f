"""Error catalog for boon_spark.

Mirrors the reference's error surface (boon `src/lib.rs:560-698` ErrorKind
Display impls and `src/compiler.rs` CompileError) so violation rows carry the
same human-readable messages a boon user expects, while the *representation*
is Spark-native: violations are rows `(instance_location, keyword_location,
error)` matching boon's basic-output units (`src/output.rs:416-445`).
"""

from __future__ import annotations


class CompileError(Exception):
    """Raised when a constraint schema cannot be compiled.

    Mirrors boon's CompileError (reference `src/compiler.rs:703-935`):
    invalid schemas fail at compile time on the driver, never at run time
    on executors.
    """


class UnsupportedKeyword(CompileError):
    """Keyword is recognised but deliberately unsupported over flat rows.

    The reference's `$recursiveRef`/`$dynamicRef` dynamic-scope machinery
    (`src/validator.rs:579-652`) has no meaning for fixed-width DataFrame
    rows; we fail loudly at compile, mirroring boon's
    CompileError::UnsupportedVocabulary style (`src/compiler.rs:808-809`).
    """


# Message templates mirroring boon `src/lib.rs:560-698`.  `{got}` / `{want}`
# are filled with Spark string expressions at plan-build time, so the text of
# a violation row matches boon's Display output for the same failure.
MESSAGES = {
    "false_schema": "false schema",
    "type": "want {want}, but got {got}",
    "enum": "value must be one of {want}",
    "enum_one": "value must be {want}",
    "const": "value must be {want}",
    "format": "{got} is not valid {want}",
    "required": "missing properties {want}",
    "dependent_required": "properties {want} required, if {prop} property exists",
    "min_properties": "minimum {want} properties required, but got {got} properties",
    "max_properties": "maximum {want} properties required, but got {got} properties",
    "min_items": "minimum {want} items required, but got {got} items",
    "max_items": "maximum {want} items required, but got {got} items",
    "contains": "no items match contains schema",
    "min_contains": "minimum {want} items required to match contains schema, but found {got}",
    "max_contains": "maximum {want} items required to match contains schema, but found {got}",
    "unique_items": "items at {i} and {j} are equal",
    "min_length": "length must be >={want}, but got {got}",
    "max_length": "length must be <={want}, but got {got}",
    "pattern": "{got} does not match pattern {want}",
    "minimum": "must be >={want}, but got {got}",
    "maximum": "must be <={want}, but got {got}",
    "exclusive_minimum": "must be > {want} but got {got}",
    "exclusive_maximum": "must be < {want} but got {got}",
    "multiple_of": "{got} is not multipleOf {want}",
    "not": "not failed",
    "all_of": "allOf failed",
    "any_of": "anyOf failed",
    "one_of_none": "oneOf failed, none matched",
    "one_of_many": "oneOf failed, multiple subschemas matched",
    "items": "item does not match items schema",
}
