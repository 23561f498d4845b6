"""Vocabulary byte table + vectorized per-DFA-state token bitmasks.

The hot operation of constrained decoding: given a DFA state, which of
the V vocab tokens keep the automaton alive? Computed lazily per state
with a fully vectorized numpy sweep over a precomputed
[V, max_token_len] byte-class matrix — O(max_token_len) gathers per
state instead of a Python loop over the vocabulary (reference
capability: xgrammar's fill_next_token_bitmask,
vllm/v1/structured_output/backend_xgrammar.py).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

MAX_TOKEN_BYTES = 64  # longer tokens are treated as never-valid


def _gpt2_byte_decoder() -> dict[str, int]:
    """Inverse of GPT-2's bytes_to_unicode (byte-level BPE vocabs
    render bytes as printable unicode chars)."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("¡"), ord("¬") + 1)) +
          list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def token_bytes_table(tokenizer) -> list[Optional[bytes]]:
    """Raw byte string of every vocab id (None = never usable:
    special tokens, over-long tokens, unmappable ids)."""
    vocab_size = len(tokenizer)
    special_ids = set(getattr(tokenizer, "all_special_ids", []) or [])
    tokens = tokenizer.convert_ids_to_tokens(list(range(vocab_size)))

    # detect convention: sentencepiece uses '▁' for space and <0xXX>
    # byte tokens; byte-level BPE uses the GPT-2 unicode byte alphabet
    is_spm = any(t is not None and "▁" in t
                 for t in tokens[:1000] if isinstance(t, str))
    byte_dec = None if is_spm else _gpt2_byte_decoder()

    out: list[Optional[bytes]] = []
    for tid, tok in enumerate(tokens):
        if tok is None or tid in special_ids:
            out.append(None)
            continue
        try:
            if is_spm:
                if (len(tok) == 6 and tok.startswith("<0x")
                        and tok.endswith(">")):
                    bs = bytes([int(tok[3:5], 16)])
                else:
                    bs = tok.replace("▁", " ").encode("utf-8")
            else:
                bs = bytes(byte_dec[c] for c in tok)
        except (KeyError, ValueError):
            out.append(None)
            continue
        if len(bs) == 0 or len(bs) > MAX_TOKEN_BYTES:
            out.append(None)
        else:
            out.append(bs)
    return out


class TrieNode:
    __slots__ = ("children", "token_ids")

    def __init__(self) -> None:
        self.children: dict[int, "TrieNode"] = {}
        self.token_ids: list[int] = []


class TokenIndex:
    """Per-tokenizer immutable index shared by all grammars."""

    def __init__(self, tokenizer, vocab_size: Optional[int] = None):
        """``vocab_size``: the MODEL's vocab (may exceed the
        tokenizer's; extra ids are never valid)."""
        table = token_bytes_table(tokenizer)
        self.vocab_size = vocab_size or len(table)
        v = min(len(table), self.vocab_size)
        self.max_len = max(
            (len(b) for b in table[:v] if b is not None), default=1)
        self.bytes_matrix = np.zeros((self.vocab_size, self.max_len),
                                     dtype=np.uint8)
        self.lengths = np.zeros(self.vocab_size, dtype=np.int32)
        self.usable = np.zeros(self.vocab_size, dtype=bool)
        for tid in range(v):
            b = table[tid]
            if b is None:
                continue
            self.bytes_matrix[tid, :len(b)] = np.frombuffer(b, np.uint8)
            self.lengths[tid] = len(b)
            self.usable[tid] = True
        self.eos_token_id = tokenizer.eos_token_id
        self.num_words = (self.vocab_size + 31) // 32
        self._shift = (1 << np.arange(32, dtype=np.uint64))

    def walk_all(self, dfa, state: int) -> np.ndarray:
        """Final DFA state for every vocab token starting at `state`
        (vectorized sweep; dead stays dead)."""
        cls_matrix = dfa.byte_to_class[self.bytes_matrix]  # [V, L]
        states = np.full(self.vocab_size, state, dtype=np.int32)
        for col in range(self.max_len):
            active = col < self.lengths
            nxt = dfa.table[states, cls_matrix[:, col]]
            states = np.where(active, nxt, states)
        return states

    def valid_mask(self, dfa, state: int) -> np.ndarray:
        """bool [V]: tokens that keep the DFA alive from `state`."""
        finals = self.walk_all(dfa, state)
        return self.usable & (finals != dfa.dead)

    def byte_trie(self) -> "TrieNode":
        """Vocab byte trie (built once, shared): the EBNF PDA walks it
        to compute token masks with shared-prefix pruning."""
        if getattr(self, "_trie", None) is None:
            root = TrieNode()
            for tid in range(self.vocab_size):
                if not self.usable[tid]:
                    continue
                node = root
                for b in self.bytes_matrix[tid, :self.lengths[tid]]:
                    b = int(b)
                    child = node.children.get(b)
                    if child is None:
                        child = node.children[b] = TrieNode()
                    node = child
                node.token_ids.append(tid)
            self._trie = root
        return self._trie

    def pack_bitmask(self, valid: np.ndarray,
                     allow_eos: bool) -> np.ndarray:
        """bool [V] → int32 words [ceil(V/32)]; bit j of word w is
        token w*32+j."""
        v = valid.copy()
        if allow_eos and self.eos_token_id is not None:
            v[self.eos_token_id] = True
        padded = np.zeros(self.num_words * 32, dtype=bool)
        padded[:self.vocab_size] = v
        words = (padded.reshape(-1, 32).astype(np.uint64) *
                 self._shift).sum(axis=1)
        return words.astype(np.uint32).view(np.int32)
