"""boon_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the semantics of santhosh-tekuri/boon
(a Rust JSON Schema validator, reference at /root/reference) over Spark
DataFrames: declarative keyword constraints compiled once on the driver
into a single vectorized projection of check columns, producing per-row
verdicts plus structured violation rows, extended with the cross-row
checks (uniqueness, referential integrity, column stats, distribution
drift) a table-scale validator needs.

Spark-first, not a port: the reference is the *spec* for keyword
semantics and error output; the execution strategy is Catalyst's.
"""

from .engine import Engine, ValidationResult, validate_table
from .errors import CompileError, UnsupportedKeyword
from .loaders import file_loader, scheme_loader
from .schema import compile_schema
from .functions.formats import register_format
from .functions.content import (register_content_encoding,
                                register_content_media_type)

__all__ = [
    "Engine", "ValidationResult", "validate_table", "compile_schema",
    "CompileError", "UnsupportedKeyword", "register_format",
    "register_content_encoding", "register_content_media_type",
    "file_loader", "scheme_loader",
]

__version__ = "0.1.0"
