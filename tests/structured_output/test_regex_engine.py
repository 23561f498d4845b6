"""Regex-engine unit tests: DFA fullmatch vs Python re on supported
syntax (our engine is byte-level; cases chosen to have identical
semantics)."""

import re

import pytest

from vllm_main_modify_tpu.structured_output.regex_engine import (
    compile_regex, fullmatch)

CASES = [
    (r"abc", ["abc"], ["ab", "abcd", ""]),
    (r"a*", ["", "a", "aaaa"], ["b", "ab"]),
    (r"a+b?", ["a", "ab", "aaab"], ["b", "", "abb"]),
    (r"(ab|cd)+", ["ab", "cdab", "ababcd"], ["", "a", "abc"]),
    (r"[0-9]{2,4}", ["12", "123", "1234"], ["1", "12345", "ab"]),
    (r"[a-c]x[^y]", ["axz", "bx0"], ["dxz", "axy", "ax"]),
    (r"\d+\.\d+", ["3.14", "10.0"], ["3.", ".5", "3a14"]),
    (r"-?(0|[1-9]\d*)", ["0", "-17", "903"], ["01", "-", "--3"]),
    (r"a{3}", ["aaa"], ["aa", "aaaa"]),
    (r"a{2,}", ["aa", "aaaaa"], ["a", ""]),
    (r"(?:foo|bar)*baz", ["baz", "foobaz", "barfoobaz"],
     ["fo", "bazz"]),
    (r"\w+@\w+\.com", ["a_1@b.com"], ["a@b.org", "@b.com"]),
]


@pytest.mark.parametrize("pattern,good,bad", CASES)
def test_matches_python_re(pattern, good, bad):
    dfa = compile_regex(pattern)
    for s in good:
        assert re.fullmatch(pattern, s), f"test case invalid: {s}"
        assert fullmatch(dfa, s.encode()), f"{pattern} should match {s}"
    for s in bad:
        assert not re.fullmatch(pattern, s)
        assert not fullmatch(dfa, s.encode()), \
            f"{pattern} should reject {s}"


def test_utf8_literals():
    dfa = compile_regex("héllo")
    assert fullmatch(dfa, "héllo".encode())
    assert not fullmatch(dfa, "hello".encode())


def test_escaped_metachars():
    dfa = compile_regex(r"\{\"a\": \d+\}")
    assert fullmatch(dfa, b'{"a": 42}')
    assert not fullmatch(dfa, b'{"a": x}')


def test_dead_state_is_sink():
    dfa = compile_regex("ab")
    s = dfa.step_bytes(dfa.start, b"x")
    assert dfa.is_dead(s)
    assert dfa.is_dead(dfa.step_bytes(s, b"ab"))
