"""JSON schema → regex (for the byte-DFA engine).

Reference capability: xgrammar's JSON-schema grammars
(vllm/v1/structured_output/backend_xgrammar.py). This converter covers
the practical subset: object properties (string/number/integer/
boolean/null/enum/const/array/nested object), required vs optional
properties, arrays with item schemas and min/maxItems, string
enum/pattern, and a generic JSON value grammar for ``json_object``
mode / untyped schemas.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

# Inter-property whitespace. BOUNDED: an unbounded [ \n\t]* lets a
# degenerate policy emit whitespace forever without ever violating the
# grammar (xgrammar bounds it the same way for this reason).
WS = r"[ \n\t]{0,2}"

STRING_RE = r'"(?:[^"\\\x00-\x1f]|\\(?:["\\/bfnrt]|u[0-9a-fA-F]{4}))*"'
INTEGER_RE = r"-?(?:0|[1-9]\d*)"
NUMBER_RE = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
BOOLEAN_RE = r"(?:true|false)"
NULL_RE = r"null"

# generic JSON value, depth-bounded (a DFA cannot do unbounded nesting)
_MAX_DEPTH = 5


def _value_re(depth: int) -> str:
    scalars = [STRING_RE, NUMBER_RE, BOOLEAN_RE, NULL_RE]
    if depth <= 0:
        return "(?:" + "|".join(scalars) + ")"
    v = _value_re(depth - 1)
    arr = r"\[" + WS + f"(?:{v}(?:{WS},{WS}{v})*)?" + WS + r"\]"
    obj = (r"\{" + WS +
           f"(?:{STRING_RE}{WS}:{WS}{v}(?:{WS},{WS}{STRING_RE}{WS}:{WS}{v})*)?"
           + WS + r"\}")
    return "(?:" + "|".join(scalars + [arr, obj]) + ")"


def json_value_regex() -> str:
    """Any JSON value (json_object mode)."""
    return _value_re(_MAX_DEPTH)


def _escape_literal(s: str) -> str:
    """Escape a literal string for the regex engine."""
    out = []
    for ch in s:
        if ch in r"\^$.|?*+()[]{}":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _schema_re(schema: Any, depth: int = _MAX_DEPTH) -> str:
    if schema is True or schema in (None, {}):
        return _value_re(min(depth, 2))
    if not isinstance(schema, dict):
        raise ValueError(f"unsupported schema: {schema!r}")

    if "const" in schema:
        return _escape_literal(json.dumps(schema["const"]))
    if "enum" in schema:
        return "(?:" + "|".join(
            _escape_literal(json.dumps(v)) for v in schema["enum"]) + ")"
    if "anyOf" in schema or "oneOf" in schema:
        subs = schema.get("anyOf") or schema.get("oneOf")
        return "(?:" + "|".join(_schema_re(s, depth) for s in subs) + ")"

    t = schema.get("type")
    if isinstance(t, list):
        return "(?:" + "|".join(
            _schema_re({**schema, "type": ti}, depth) for ti in t) + ")"

    if t == "string":
        if "pattern" in schema:
            # inner pattern applies to the string content
            return f'"{schema["pattern"]}"'
        return STRING_RE
    if t == "integer":
        return INTEGER_RE
    if t == "number":
        return NUMBER_RE
    if t == "boolean":
        return BOOLEAN_RE
    if t == "null":
        return NULL_RE
    if t == "array":
        item = _schema_re(schema.get("items", {}), depth - 1)
        min_items = schema.get("minItems", 0)
        max_items = schema.get("maxItems")
        if max_items is not None:
            if min_items > 0:
                rest = (f"(?:{WS},{WS}{item}){{{min_items - 1},"
                        f"{max_items - 1}}}")
                body = f"{item}{rest}"
            else:
                rest = f"(?:{WS},{WS}{item}){{0,{max_items - 1}}}"
                body = f"(?:{item}{rest})?" if max_items > 0 else ""
        elif min_items > 0:
            body = (f"{item}(?:{WS},{WS}{item})*"
                    if min_items == 1 else
                    f"{item}(?:{WS},{WS}{item}){{{min_items - 1},}}")
        else:
            body = f"(?:{item}(?:{WS},{WS}{item})*)?"
        return r"\[" + WS + body + WS + r"\]"
    if t == "object" or "properties" in schema:
        return _object_re(schema, depth)
    # untyped
    return _value_re(min(depth, 2))


def _object_re(schema: dict, depth: int) -> str:
    props: dict = schema.get("properties", {})
    required = set(schema.get("required", []))
    if not props:
        return _value_re(1)

    # Keys in declaration order; optional properties may be skipped.
    # Build as: { "k1": v1 , "k2": v2 ... } where each optional
    # property (with its comma handling) is an alternation.  Exact
    # comma placement with arbitrary optional subsets needs a CFG; we
    # approximate by emitting, for N properties where the tail set is
    # optional, alternations over contiguous prefixes — the common
    # generation pattern (all props in order, optionals possibly
    # absent) is covered via per-property optionality with separator
    # folded in.
    parts = []
    first = True
    for key, sub in props.items():
        key_re = _escape_literal(json.dumps(key))
        val_re = _schema_re(sub, depth - 1)
        piece = f"{key_re}{WS}:{WS}{val_re}"
        if first:
            if key in required:
                parts.append(piece)
            else:
                parts.append(f"(?:{piece})?")
            first = False
        else:
            sep = f"{WS},{WS}"
            if key in required:
                parts.append(f"{sep}{piece}")
            else:
                parts.append(f"(?:{sep}{piece})?")
    body = "".join(parts)
    return r"\{" + WS + body + WS + r"\}"


def schema_to_regex(schema: Any) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _schema_re(schema)


def choice_to_regex(choices: list[str]) -> str:
    return "(?:" + "|".join(_escape_literal(c) for c in choices) + ")"
