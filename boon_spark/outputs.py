"""Detailed-output tree + human display formats.

boon's ``detailed_output`` (``src/output.rs:89-137``) emits the spec's
hierarchical format: one ``OutputUnit`` per error-tree node —
``{valid, keywordLocation, [absoluteKeywordLocation], instanceLocation,
error | errors}`` — where a scope that collected several errors wraps
them as a Group ("validation failed", ``src/validator.rs:30-58,853``)
and a scope with exactly one error collapses to that error (no wrapper
frame).  The engine stores violations FLAT (the scalable DataFrame
view); this module reconstructs boon's tree driver-side from the flat
rows' keyword locations — output rendering is inherently driver-side
and bounded by the caller's limit.

``render_simple`` is boon's default ``simple`` display and ``alt`` its
alternate form with schema locations (``src/output.rs:142-183``,
``Indent``/``SchemaLocation``; CLI wiring ``cli/src/main.rs:152-162``).
"""

from __future__ import annotations

from typing import Optional

# frame heads that open a subschema scope in a keyword-location pointer;
# mirrors the applicator set of SURVEY.md §2 (boon's per-keyword
# subschema calls in src/validator.rs:200-770)
_TWO_TOKEN = frozenset({
    "properties", "patternProperties", "prefixItems", "anyOf", "allOf",
    "oneOf", "dependentSchemas", "dependencies",
})
_ONE_TOKEN = frozenset({
    "items", "additionalItems", "contains", "not", "if", "then", "else",
    "propertyNames", "contentSchema", "additionalProperties",
    "unevaluatedProperties", "unevaluatedItems", "$ref",
    "$recursiveRef", "$dynamicRef",
})

# keyword tokens that dereference into another schema location — a
# violation reached through any of them carries an absolute keyword
# location that differs from its use-site pointer
_REF_TOKENS = ("/$ref", "/$recursiveRef", "/$dynamicRef")


def _frames(keyword_location: str) -> tuple[tuple[str, ...], str]:
    """Split a keyword-location pointer into (subschema frame path, leaf
    keyword suffix).  A trailing frame head with nothing after it (e.g.
    ``/properties/xs/contains``) is the failing keyword itself, not a
    scope."""
    toks = [t for t in keyword_location.split("/") if t != ""]
    frames: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t in _TWO_TOKEN and i + 1 < len(toks):
            frames.append(t)
            frames.append(toks[i + 1])
            i += 2
        elif t in _ONE_TOKEN:
            frames.append(t)
            i += 1
        else:
            break
    leaf = toks[i:]
    if not leaf and frames:
        # the last "frame" was actually the failing keyword
        n = 2 if len(frames) >= 2 and frames[-2] in _TWO_TOKEN else 1
        leaf, frames = frames[-n:], frames[:-n]
    return tuple(frames), "/".join(leaf)


def _common_pointer_prefix(pointers: list[str]) -> str:
    segs = [p.split("/") for p in pointers]
    out = segs[0]
    for s in segs[1:]:
        n = 0
        while n < min(len(out), len(s)) and out[n] == s[n]:
            n += 1
        out = out[:n]
    return "/".join(out)


def _leaf_unit(v: dict) -> dict:
    unit = {"valid": False,
            "keywordLocation": v["keyword_location"]}
    abs_loc = v.get("absolute_keyword_location")
    # boon includes absoluteKeywordLocation only inside a ref scope
    # (output.rs:102-106, InRef) — i.e. when it differs from the
    # use-site keyword location; $recursiveRef/$dynamicRef scopes count
    # (ADVICE r3)
    if abs_loc and abs_loc.lstrip("#") != v["keyword_location"] \
            and any(t in v["keyword_location"] for t in _REF_TOKENS):
        unit["absoluteKeywordLocation"] = abs_loc
    unit["instanceLocation"] = v["instance_location"]
    unit["error"] = v["error"]
    return unit


def _build_scope(frames: tuple[str, ...], items: list[dict],
                 *, is_root: bool = False) -> dict:
    """One schema scope: leaf errors at this scope plus child scopes,
    grouped exactly like boon's validate() error collection — one error
    passes through, several wrap in a Group unit."""
    leaves = [v for v in items if v["_frames"] == frames]
    deeper: dict[str, list[dict]] = {}
    for v in items:
        if v["_frames"] != frames:
            head = v["_frames"][len(frames)]
            if head in _TWO_TOKEN:
                head = "/".join(v["_frames"][len(frames):len(frames) + 2])
            deeper.setdefault(head, []).append(v)
    # an applicator-failure wrapper row (e.g. "contentSchema failed")
    # whose keyword location IS a child scope becomes that scope's branch
    # unit — boon converts the parent's Leaf into Branch(causes),
    # dropping its own message (output.rs:123-131)
    child_paths = {"/" + "/".join(frames + (head,)) for head in deeper}
    leaves = [v for v in leaves
              if v["keyword_location"] not in child_paths]
    children = [_leaf_unit(v) for v in leaves]
    for head in deeper:
        sub = deeper[head]
        child_frames = sub[0]["_frames"][:len(frames) +
                                         len(head.split("/"))]
        children.append(_build_scope(child_frames, sub))
    children.sort(key=lambda u: (u["instanceLocation"],
                                 u["keywordLocation"]))
    if len(children) == 1 and not is_root:
        return children[0]
    return {
        "valid": False,
        "keywordLocation": ("/" + "/".join(frames)) if frames else "",
        "instanceLocation": _common_pointer_prefix(
            [u["instanceLocation"] for u in children]),
        "errors": children,
    }


def nest_violations(violations: list[dict],
                    row_pointer: str = "") -> Optional[dict]:
    """boon ``detailed_output`` tree from one row's flat violation rows
    (dicts with instance_location / keyword_location /
    absolute_keyword_location / error).  Returns None for an empty list.
    """
    if not violations:
        return None
    items = []
    for v in violations:
        v = dict(v)
        v["_frames"], _ = _frames(v["keyword_location"])
        items.append(v)
    root = _build_scope(tuple(), items, is_root=True)
    # the root unit covers the whole instance (boon's Schema frame) —
    # never the common prefix of its causes
    root["instanceLocation"] = row_pointer
    return root


# ---------------------------------------------------------------------------
# human display formats (simple / alt)
# ---------------------------------------------------------------------------

def _quote(s: str) -> str:
    return "'" + s.replace("'", r"\'") + "'"


def render_simple(tree: dict, *, alt: bool = False,
                  schema_url: str = "") -> str:
    """boon's ``simple`` display / ``alt`` alternate form
    (``src/output.rs:142-183``): an indented cause hierarchy, two spaces
    per level with ``- `` bullets; ``alt`` appends the schema location
    ``[S#<pointer>]`` to each line."""
    lines = [f"jsonschema validation failed with {schema_url}#"]

    def wr(unit: dict, depth: int):
        pad = "  " * (depth - 1) + "- "
        msg = unit.get("error", "validation failed")
        line = f"{pad}at {_quote(unit['instanceLocation'])}"
        if alt:
            ptr = unit.get("absoluteKeywordLocation",
                           "#" + unit["keywordLocation"])
            line += f" [S{ptr}]"
        line += f": {msg}"
        lines.append(line)
        for child in unit.get("errors", []):
            wr(child, depth + 1)

    for child in tree.get("errors", []):
        wr(child, 1)
    if "error" in tree:  # root-level leaf (e.g. boolean false schema)
        wr(tree, 1)
    return "\n".join(lines)
