"""Validation engine — the analogue of boon's ``Schemas::validate``
(reference ``src/lib.rs:186-195``) lifted from one-value-per-call to
whole-table, single-projection evaluation.

``Engine(schema).annotate(df)`` adds three columns in ONE ``select`` (no
shuffle, whole-stage codegen):

* ``valid``            — boolean verdict per row (boon's Ok/Err)
* ``violations``       — array<struct> of basic-output units
                         (``src/output.rs:416-445``), capped
* ``violation_count``  — total violations *before* the cap, so truncation
                         is never silent (SURVEY.md §7 risk note)

Output formats mirror boon's flag/basic output (``src/output.rs:33-86``).
Cross-row checks (uniqueness, referential, stats, drift — SURVEY.md §2.6)
live in ``boon_spark.operators`` and are orchestrated by
:func:`validate_table`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .plans.builder import PlanBuilder, empty_viols
from .schema import CompiledSchema, compile_schema


@dataclass
class Engine:
    """Compile once on the driver, validate any number of DataFrames —
    mirroring boon's compile-then-validate split
    (``src/compiler.rs:198-212`` / ``src/lib.rs:186-195``)."""

    compiled: CompiledSchema
    row_id: Optional[str] = None
    max_violations_per_row: int = 100
    # emit contentSchema sub-violations alongside the wrapper row (boon's
    # causes, validator.rs:507-513) — opt-in, keeps the default violation
    # stage lean; detailed_tree() re-nests them into the causes hierarchy
    content_causes: bool = False

    @classmethod
    def from_schema(cls, schema_doc, *, row_id: Optional[str] = None,
                    max_violations_per_row: int = 100,
                    resources: Optional[dict] = None,
                    loader=None, assert_format: bool = False,
                    assert_content: bool = False,
                    content_causes: bool = False,
                    fragment: str = "",
                    default_draft=None) -> "Engine":
        """``resources``/``loader`` feed cross-document $ref resolution
        (boon add_resource / SchemeUrlLoader parity);
        ``assert_format``/``assert_content`` are
        ``enable_format_assertions``/``enable_content_assertions``
        (src/compiler.rs:105-130) — see :func:`compile_schema`.
        ``fragment`` selects a subschema (anchor or JSON pointer) as the
        validation root, like boon ``compile("schema.json#a1")``."""
        return cls(compile_schema(schema_doc, resources=resources,
                                  loader=loader,
                                  assert_format=assert_format,
                                  assert_content=assert_content,
                                  fragment=fragment,
                                  default_draft=default_draft),
                   row_id=row_id,
                   max_violations_per_row=max_violations_per_row,
                   content_causes=content_causes)

    # ------------------------------------------------------------------
    def check_columns(self, df: DataFrame) -> tuple[Column, Column]:
        """Build (valid, violations) Columns against ``df``'s schema —
        for embedding checks into a caller's own select().  Hoisting is
        disabled (no staging projection exists to carry prelude columns);
        prefer :meth:`annotate` for content-heavy schemas."""
        pb = PlanBuilder(df.schema, row_id=self.row_id, allow_hoist=False,
                         base_uri=self.compiled.base_uri)
        valid, viol_arrays = pb.build(
            self.compiled.root, None, None, pb.root_iloc())
        if viol_arrays:
            arr = viol_arrays[0] if len(viol_arrays) == 1 \
                else F.concat(*viol_arrays)
            # lazy error materialization (boon bool_result,
            # src/validator.rs:849-855): only failing rows build detail
            viols = F.when(~F.coalesce(valid, F.lit(False)),
                           F.filter(arr, lambda v: v.isNotNull())) \
                .otherwise(empty_viols())
        else:
            viols = empty_viols()
        return F.coalesce(valid, F.lit(False)), viols

    def annotate(self, df: DataFrame) -> DataFrame:
        """Three staged projections, each referencing the previous:

        1. ``valid`` — the hot path.  With range-only element schemas it
           contains no higher-order functions, so it stays inside
           whole-stage codegen.
        2. ``_viols`` — violation detail, guarded by ``~valid`` (a cheap
           column reference, so the expensive struct building runs only
           for failing rows).
        3. ``violations``/``violation_count`` — slice + size of ``_viols``.

        The stages reference prior aliases more than once, so Catalyst's
        CollapseProject keeps them separate and nothing expensive is
        evaluated twice (the single-select formulation duplicated the
        whole validity expression three times, uncollapsible because
        lambda variables defeat subexpression elimination).
        """
        reserved = {"valid", "violations", "violation_count", "_viols"}
        clash = reserved & set(df.columns)
        if clash:
            raise ValueError(
                f"input columns {sorted(clash)} collide with the "
                f"engine's output columns; rename them before validating")
        pb = PlanBuilder(df.schema, row_id=self.row_id,
                         content_causes=self.content_causes,
                         base_uri=self.compiled.base_uri)
        valid, viol_arrays = pb.build(
            self.compiled.root, None, None, pb.root_iloc())
        cap = self.max_violations_per_row
        base = df
        if pb.prelude:
            # stage 0: expensive shared subexpressions (JSON parses)
            # computed exactly once, codegen'd + CSE'd
            base = df.select("*", *[c.alias(a)
                                    for a, c in pb.prelude.items()])
        step1 = base.select("*", F.coalesce(valid, F.lit(False)).alias("valid"))
        if viol_arrays:
            arr = viol_arrays[0] if len(viol_arrays) == 1 \
                else F.concat(*viol_arrays)
            viols = F.when(~F.col("valid"),
                           F.filter(arr, lambda v: v.isNotNull())) \
                .otherwise(empty_viols())
        else:
            viols = empty_viols()
        step2 = step1.select("*", viols.alias("_viols"))
        return step2.select(
            *df.columns, "valid",
            F.slice("_viols", 1, cap).alias("violations"),
            F.size("_viols").alias("violation_count"))

    def validate(self, df: DataFrame) -> "ValidationResult":
        return ValidationResult(self.annotate(df), row_id=self.row_id)


@dataclass
class ValidationResult:
    """Lazy handle over the annotated DataFrame; all methods return
    DataFrames (no driver-side collection)."""

    annotated: DataFrame
    row_id: Optional[str] = None

    def violations(self) -> DataFrame:
        """Basic-output units as rows (boon ``basic_output``,
        ``src/output.rs:38-86``).  Passing rows carry an EMPTY violations
        array, so the explode alone prunes them.  ``explode_outer`` +
        post-generate null filter is deliberate: plain ``explode`` makes
        Catalyst infer ``size(violations) > 0`` (InferFiltersFromGenerate)
        and predicate pushdown re-inlines the whole violation expression
        — prelude JSON parses included, once per alias reference — into a
        scan-side condition, blowing generated-code size and its janino
        compile time ~4x (pinned by
        test_plans.test_content_schema_plan_is_lean)."""
        return (self.annotated
                .select(F.explode_outer("violations").alias("v"))
                .filter(F.col("v").isNotNull())
                .select(
                    F.lit(False).alias("valid"),
                    F.col("v.instance_location"),
                    F.col("v.keyword_location"),
                    F.col("v.absolute_keyword_location"),
                    F.col("v.error")))

    def flag(self, by: Optional[list[str]] = None) -> DataFrame:
        """Flag output ``{"valid": bool}`` (boon ``src/output.rs:33-35``),
        optionally per group (e.g. per partition column)."""
        agg = [
            # empty group is vacuously valid (coalesce handles min-of-empty)
            F.coalesce(F.min(F.col("valid").cast("int")).cast("boolean"),
                       F.lit(True)).alias("valid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum((~F.col("valid")).cast("long")),
                       F.lit(0)).alias("n_invalid"),
            F.coalesce(F.sum("violation_count"), F.lit(0)).alias("n_violations"),
        ]
        if by:
            return self.annotated.groupBy(*by).agg(*agg)
        return self.annotated.agg(*agg)

    def detailed(self) -> DataFrame:
        """Detailed output (boon ``src/output.rs:89-137``): one row per
        failing instance with its full violation list nested — the tree
        shape, flattened one level (our schemas are one level deep)."""
        ptr = (F.concat(F.lit("/"),
                        F.coalesce(F.col(self.row_id).cast("string"),
                                   F.lit("?")))
               if self.row_id else F.lit(""))
        return (self.annotated
                .filter(~F.col("valid"))
                .select(ptr.alias("instance_location"),
                        F.col("valid"),
                        F.col("violations").alias("errors"),
                        F.col("violation_count")))

    def detailed_tree(self, limit: int = 20) -> list[dict]:
        """boon's hierarchical ``detailed_output`` (``src/output.rs:
        89-137``): one nested OutputUnit tree per failing row, causes
        grouped per subschema scope exactly like boon's error tree
        (Group wrapping / single-error collapse, src/validator.rs:30-58).
        Driver-side by design — output RENDERING is bounded by ``limit``;
        :meth:`detailed` remains the scalable flat DataFrame view."""
        from .outputs import nest_violations
        rows = self.detailed().limit(limit).collect()
        return [nest_violations([e.asDict() for e in r.errors],
                                row_pointer=r.instance_location)
                for r in rows]

    def summary(self) -> DataFrame:
        """Per-keyword failure counts — map-side partial agg, one shuffle.
        explode_outer + null filter, see :meth:`violations` for the
        inferred-filter pushdown-blowup rationale."""
        return (self.annotated
                .select(F.explode_outer("violations").alias("v"))
                .filter(F.col("v").isNotNull())
                .groupBy(F.col("v.keyword_location").alias("keyword_location"))
                .agg(F.count(F.lit(1)).alias("n_violations")))


def validate_table(df: DataFrame, spec, *, row_id: Optional[str] = None,
                   dims: Optional[dict[str, DataFrame]] = None,
                   reference_df: Optional[DataFrame] = None) -> dict:
    """Full-suite orchestrator: row-local projection + cross-row operators
    (SURVEY.md §2.6).  Returns a dict of lazy DataFrames:

    ``annotated``, ``row_violations``, ``unique_violations``,
    ``referential_violations``, ``invariant_violations``.

    ``spec`` may carry table-level extensions::

        {"schema": {...json-schema...},
         "unique": ["doc_id"],
         "references": [{"column": "source", "dim": "sources",
                         "dim_column": "source"}],
         "invariants": [{"name": "n_tok_matches",
                         "expr": "n_tok = size(tokens)"}]}
    """
    from .operators.referential import check_referential
    from .operators.uniqueness import check_unique
    from .operators.invariants import check_invariants
    from .operators.equality import check_equality

    compiled = compile_schema(spec)
    eng = Engine(compiled, row_id=row_id)
    res = eng.validate(df)
    out: dict = {
        "annotated": res.annotated,
        "row_violations": res.violations(),
        "result": res,
    }
    uniq = None
    for cols in compiled.unique:
        v = check_unique(df, cols, row_id=row_id)
        uniq = v if uniq is None else uniq.unionByName(v)
    out["unique_violations"] = uniq

    refv = None
    for ref in compiled.references:
        dim = ref.get("dim")
        if isinstance(dim, str):
            if not dims or dim not in dims:
                raise ValueError(f"reference dim {dim!r} not provided")
            dim = dims[dim]
        v = check_referential(df, ref["column"], dim,
                              dim_column=ref.get("dim_column"), row_id=row_id)
        refv = v if refv is None else refv.unionByName(v)
    out["referential_violations"] = refv

    if compiled.invariants:
        out["invariant_violations"] = check_invariants(
            df, compiled.invariants, row_id=row_id)
    else:
        out["invariant_violations"] = None

    if reference_df is not None:
        out["equality_violations"] = check_equality(
            df, reference_df, key=row_id or "doc_id")
    return out
