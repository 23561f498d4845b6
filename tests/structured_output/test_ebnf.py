"""EBNF (GBNF) pushdown-automaton backend: unit-level PDA semantics +
e2e guided generation (reference capability: backend_xgrammar.py full
grammars; test style: tests/v1/entrypoints/llm/test_guided_generate.py
guided_grammar cases)."""

import re

import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import (SamplingParams,
                                                  StructuredOutputParams)
from vllm_main_modify_tpu.structured_output.ebnf import (CompiledEBNF,
                                                         _EBNFParser)


class _FakeIndex:
    """Byte-identity vocab: token id i == byte i (+ eos 256)."""

    def __init__(self):
        import numpy as np

        self.vocab_size = 257
        self.bytes_matrix = np.zeros((257, 1), dtype=np.uint8)
        self.bytes_matrix[:256, 0] = np.arange(256)
        self.lengths = np.ones(257, dtype=np.int32)
        self.lengths[256] = 0
        self.usable = np.ones(257, dtype=bool)
        self.usable[256] = False
        self.eos_token_id = 256
        self.num_words = (257 + 31) // 32
        self._shift = (1 << np.arange(32, dtype=np.uint64))
        self._trie = None

    byte_trie = __import__(
        "vllm_main_modify_tpu.structured_output.token_index",
        fromlist=["TokenIndex"]).TokenIndex.byte_trie
    pack_bitmask = __import__(
        "vllm_main_modify_tpu.structured_output.token_index",
        fromlist=["TokenIndex"]).TokenIndex.pack_bitmask


def _accepts(compiled: CompiledEBNF, text: bytes) -> bool:
    sid = compiled.start
    for b in text:
        sid = compiled._step(sid, b)
        if sid == compiled.dead:
            return False
    return compiled.is_accept(sid)


def _compile(src: str) -> CompiledEBNF:
    return CompiledEBNF(_EBNFParser(src).parse(), _FakeIndex())


BALANCED = """
root ::= expr
expr ::= term ( ("+" | "-") term )*
term ::= num | "(" expr ")"
num  ::= [0-9]+
"""


@pytest.mark.parametrize("text,ok", [
    (b"1", True),
    (b"12+3", True),
    (b"(1+2)-3", True),
    (b"((7))", True),
    (b"", False),
    (b"1+", False),
    (b"(1+2", False),
    (b"+1", False),
    (b"1)(", False),
])
def test_balanced_expressions(text, ok):
    compiled = _compile(BALANCED)
    assert _accepts(compiled, text) is ok


def test_nesting_beyond_any_dfa():
    """Counting parens is the canonical non-regular language — the
    thing the byte-DFA backend cannot do."""
    compiled = _compile(BALANCED)
    deep = b"(" * 40 + b"5" + b")" * 40
    assert _accepts(compiled, deep)
    assert not _accepts(compiled, b"(" * 40 + b"5" + b")" * 39)


def test_quantifiers_and_classes():
    g = _compile('root ::= "ab"{2,3} [xyz]+ "!"?')
    assert _accepts(g, b"ababx")
    assert _accepts(g, b"abababzyx!")
    assert not _accepts(g, b"abx")  # {2,3} minimum
    assert not _accepts(g, b"abababab")  # above max + missing class


def test_bitmask_prunes_to_grammar():
    import numpy as np

    compiled = _compile(BALANCED)
    mask = compiled.bitmask_for_state(compiled.start)
    bits = np.unpackbits(
        mask.view(np.uint8), bitorder="little")[:257]
    allowed = {i for i in range(257) if bits[i]}
    expect = {ord(c) for c in "0123456789("}
    assert allowed == expect  # eos NOT allowed at start
    # after "1": digits, operators, eos
    sid = compiled._step(compiled.start, ord("1"))
    mask = compiled.bitmask_for_state(sid)
    bits = np.unpackbits(mask.view(np.uint8), bitorder="little")[:257]
    allowed = {i for i in range(257) if bits[i]}
    assert allowed == {ord(c) for c in "0123456789+-"} | {256}


def test_left_recursion_rejected():
    with pytest.raises(ValueError, match="recursion"):
        _compile('root ::= root "x" | "y"')._step(0, 0)


def test_guided_grammar_e2e(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256)
    # bounded quantifiers so the constrained rollout must close the
    # paren and hit EOS within max_tokens
    grammar = """
root ::= "fn " name "(" args ")"
name ::= [a-z]{1,4}
args ::= "" | name ("," name){0,2}
"""
    p = SamplingParams(
        temperature=0.9, seed=3, max_tokens=40,
        structured_outputs=StructuredOutputParams(grammar=grammar))
    out = llm.generate(["code:"], p)[0]
    text = out.outputs[0].text
    assert re.fullmatch(
        r"fn [a-z]{1,4}\(([a-z]{1,4}(,[a-z]{1,4}){0,2})?\)", text), \
        text
