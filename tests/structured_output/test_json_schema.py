"""JSON-schema → regex → DFA: valid documents accepted, invalid
rejected (reference capability: xgrammar schema grammars)."""

import json

import pytest

from vllm_main_modify_tpu.structured_output.json_schema import (
    choice_to_regex, json_value_regex, schema_to_regex)
from vllm_main_modify_tpu.structured_output.regex_engine import (
    compile_regex, fullmatch)


def matches(schema, doc: str) -> bool:
    dfa = compile_regex(schema_to_regex(schema))
    return fullmatch(dfa, doc.encode())


def test_simple_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name", "age"],
    }
    assert matches(schema, '{"name": "bob", "age": 42}')
    assert matches(schema, '{"name":"x","age":0}')
    assert not matches(schema, '{"name": "bob"}')  # missing required
    assert not matches(schema, '{"name": "bob", "age": "x"}')
    assert not matches(schema, '{"age": 42, "name": "bob"}')  # order


def test_enum_and_const():
    schema = {"enum": ["red", "green", 3]}
    assert matches(schema, '"red"')
    assert matches(schema, "3")
    assert not matches(schema, '"blue"')
    schema2 = {"const": True}
    assert matches(schema2, "true")
    assert not matches(schema2, "false")


def test_number_formats():
    schema = {"type": "number"}
    for doc in ["0", "-1.5", "3.14", "1e10", "2.5E-3"]:
        assert matches(schema, doc), doc
    for doc in ["01", "+-3", "1.", ".5"]:
        assert not matches(schema, doc), doc


def test_array():
    schema = {"type": "array", "items": {"type": "integer"},
              "minItems": 1, "maxItems": 3}
    assert matches(schema, "[1]")
    assert matches(schema, "[1, 2, 3]")
    assert not matches(schema, "[]")
    assert not matches(schema, "[1, 2, 3, 4]")
    assert not matches(schema, '["a"]')


def test_nested_object():
    schema = {
        "type": "object",
        "properties": {
            "user": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
                "required": ["id"],
            },
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["user", "tags"],
    }
    assert matches(schema, '{"user": {"id": 7}, "tags": ["a", "b"]}')
    assert not matches(schema, '{"user": {}, "tags": []}')


def test_string_escapes():
    schema = {"type": "string"}
    assert matches(schema, json.dumps("he said \"hi\"\n"))
    assert matches(schema, '"\\u00e9"')
    assert not matches(schema, '"unterminated')


def test_json_object_mode():
    dfa = compile_regex(json_value_regex())
    for doc in ['{"a": [1, {"b": null}]}', "[]", '"x"', "42", "true"]:
        assert fullmatch(dfa, doc.encode()), doc
    assert not fullmatch(dfa, b"{bad}")


def test_choice():
    dfa = compile_regex(choice_to_regex(["yes", "no", "maybe (later)"]))
    assert fullmatch(dfa, b"yes")
    assert fullmatch(dfa, b"maybe (later)")
    assert not fullmatch(dfa, b"nope")


def test_anyof():
    schema = {"anyOf": [{"type": "integer"}, {"type": "boolean"}]}
    assert matches(schema, "7")
    assert matches(schema, "false")
    assert not matches(schema, '"7"')
