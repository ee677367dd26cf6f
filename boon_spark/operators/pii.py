"""PII detection and masking for training-data pipelines.

Regex-based scrubbing of the classic identifier shapes (emails, IPv4
addresses, SSN-style ids, credit-card-style numbers, phone-style
numbers) — the standard pre-training hygiene pass (cf. the public C4 /
BigScience ROOTS / Dolma pipelines).

Pure codegen: chained ``regexp_replace`` / ``regexp_count`` column
expressions — zero shuffle, whole-stage-codegen'd, scale-free.  Every
pattern is written in the COMMON SUBSET of Java regex (Spark) and RE2
(DuckDB oracles): character classes, bounded repetition, ``\\b``
anchors, non-capturing groups — no lookaround, no backreferences — AND
shaped so the two dialects' match policies cannot diverge: every
bounded digit run is flanked by a mandatory non-digit (separator or
``\\b``), which FORCES the quantifier assignment, so leftmost-first
(Java, backtracking) and leftmost-longest (RE2) produce identical
spans.  The one alternation (credit_card) has mutually-exclusive arms
(separator'd 4x4 vs bare 16-digit) — at any start position at most one
arm can match, so first-vs-longest arm policy is moot.  The oracle
reproduces masked text byte-for-byte; a cross-engine fuzz pins it.

One DOCUMENTED dialect divergence: Java's ``\\b`` is Unicode-aware
(``é`` is a word character) while RE2's is ASCII-only, so PII glued to
a non-ASCII letter (``café1.2.3.4``) is NOT masked by Spark but would
be by a naive RE2 oracle.  The operator's semantics are the Java ones —
digits embedded in a non-ASCII word are not a standalone identifier —
and the oracle contract is exact over ASCII-delimited text (the fuzz
pins byte-equality there, and pins this divergence case explicitly).

Masking order is fixed (``KINDS`` order: email → ipv4 → ssn →
credit_card → phone): longer/more-specific shapes first, so a
credit-card number is not half-eaten by the looser phone pattern.  The
oracle generator emits the same chain in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind → (pattern, mask token).  Order is the masking order.
KINDS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "credit_card": (r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b|\b\d{16}\b",
                    "<CC>"),
    # rigid 3-group form (each digit run is closed by a mandatory
    # separator or \b — forced quantifiers, dialect-safe).  NB: \b\+?
    # means a leading + is only consumed after a word char; "+1 555..."
    # masks from the 1 and leaves the + (documented recall bound).
    "phone": (r"\b\+?\d{1,3}[ .-]\d{3,4}[ .-]\d{3,4}\b", "<PHONE>"),
}


def _check_kinds(kinds) -> list[str]:
    unknown = [k for k in kinds if k not in KINDS]
    if unknown:
        raise ValueError(f"unknown PII kinds: {unknown}; "
                         f"known: {list(KINDS)}")
    # preserve canonical masking order regardless of caller order
    return [k for k in KINDS if k in set(kinds)]


def mask_pii_col(text: Column, kinds=tuple(KINDS)) -> Column:
    """Masked text column: each kind's matches replaced by its token,
    applied in canonical order."""
    out = text
    for k in _check_kinds(kinds):
        pat, tok = KINDS[k]
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts(text: Column, kinds=tuple(KINDS)) -> dict[str, Column]:
    """Per-kind match counts ON THE PROGRESSIVELY MASKED text — counted
    at the same stage of the chain where that kind is replaced, so each
    match is attributed to exactly one kind (an SSN inside an email
    local-part counts as email, not SSN), and counts agree with what
    :func:`mask_pii_col` actually replaced."""
    out: dict[str, Column] = {}
    cur = text
    for k in _check_kinds(kinds):
        pat, tok = KINDS[k]
        out[k] = F.regexp_count(cur, F.lit(pat)).cast("bigint")
        cur = F.regexp_replace(cur, pat, tok)
    return out


def mask_pii(df: DataFrame, *, text_col: str = "text",
             kinds=tuple(KINDS), out_col: str | None = None,
             with_counts: bool = False) -> DataFrame:
    """Replace ``text_col`` (or add ``out_col``) with masked text; with
    ``with_counts``, add one ``n_pii_<kind>`` bigint column per kind."""
    t = F.col(text_col)
    target = out_col or text_col
    masked = mask_pii_col(t, kinds).alias(target)
    if target in df.columns:
        # replace in place, keeping the schema's column order (a
        # positional consumer downstream must not see text move)
        proj = [masked if c == target else F.col(c) for c in df.columns]
    else:
        proj = [F.col(c) for c in df.columns] + [masked]
    if with_counts:
        proj += [v.alias(f"n_pii_{k}")
                 for k, v in pii_counts(t, kinds).items()]
    return df.select(*proj)


def mask_pii_oracle_expr(text_sql: str, kinds=tuple(KINDS)) -> str:
    """DuckDB expression reproducing :func:`mask_pii_col` byte-for-byte:
    the same patterns in the same order with the global flag."""
    out = text_sql
    for k in _check_kinds(kinds):
        pat, tok = KINDS[k]
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{tok}', 'g')"
    return out


def pii_counts_oracle_exprs(text_sql: str,
                            kinds=tuple(KINDS)) -> dict[str, str]:
    """DuckDB expressions reproducing :func:`pii_counts` (match counts
    on the progressively masked text, like the Spark chain)."""
    out: dict[str, str] = {}
    cur = text_sql
    for k in _check_kinds(kinds):
        pat, tok = KINDS[k]
        sql_pat = pat.replace("'", "''")
        out[k] = (f"CAST(len(regexp_extract_all({cur}, '{sql_pat}')) "
                  f"AS BIGINT)")
        cur = f"regexp_replace({cur}, '{sql_pat}', '{tok}', 'g')"
    return out
