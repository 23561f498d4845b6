"""Grammar: a compiled DFA + token index, tracking per-request state.

Reference contract: vllm/v1/structured_output/backend_types.py
``StructuredOutputGrammar`` — accept_tokens / validate_tokens /
rollback / fill_bitmask / is_terminated / reset.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from vllm_main_modify_tpu.structured_output.regex_engine import DFA
from vllm_main_modify_tpu.structured_output.token_index import TokenIndex

logger = logging.getLogger(__name__)


class CompiledGrammar:
    """Immutable, shared across requests with the same spec: the DFA
    plus a lazily-filled per-state bitmask cache."""

    def __init__(self, dfa: DFA, index: TokenIndex) -> None:
        self.dfa = dfa
        self.index = index
        self._mask_cache: dict[int, np.ndarray] = {}
        self._walk_cache: dict[int, np.ndarray] = {}

    def bitmask_for_state(self, state: int) -> np.ndarray:
        mask = self._mask_cache.get(state)
        if mask is None:
            finals = self.index.walk_all(self.dfa, state)
            self._walk_cache[state] = finals
            valid = self.index.usable & (finals != self.dfa.dead)
            mask = self.index.pack_bitmask(
                valid, allow_eos=self.dfa.is_accept(state))
            self._mask_cache[state] = mask
        return mask

    def next_state(self, state: int, token_id: int) -> int:
        """Advance by one token (uses the cached vectorized walk when
        available)."""
        finals = self._walk_cache.get(state)
        if finals is not None:
            return int(finals[token_id])
        length = int(self.index.lengths[token_id])
        data = self.index.bytes_matrix[token_id, :length].tobytes()
        return self.dfa.step_bytes(state, data)


class Grammar:
    """Per-request FSM state over a shared CompiledGrammar."""

    def __init__(self, compiled: CompiledGrammar,
                 request_id: str = "", audit=None) -> None:
        self.compiled = compiled
        self.request_id = request_id
        self.state = compiled.dfa.start
        self.state_history: list[int] = []
        self.terminated = False
        self._audit = audit

    # --- reference-contract methods -----------------------------------

    def accept_tokens(self, request_id: str,
                      token_ids: list[int]) -> bool:
        """Advance the FSM; returns False (and stops) on an invalid
        token. EOS terminates when in an accepting state."""
        idx = self.compiled.index
        for tid in token_ids:
            if self.terminated:
                break
            if tid == idx.eos_token_id:
                ok = self.compiled.dfa.is_accept(self.state)
                self.terminated = True
                if self._audit is not None:
                    self._audit.record_token(request_id, tid, ok,
                                             self.state)
                    self._audit.record_termination(request_id, ok)
                return ok
            self.state_history.append(self.state)
            new_state = self.compiled.next_state(self.state, tid)
            accepted = new_state != self.compiled.dfa.dead
            if self._audit is not None:
                self._audit.record_token(request_id, tid, accepted,
                                         new_state)
            if not accepted:
                self.state_history.pop()
                return False
            self.state = new_state
        return True

    def validate_tokens(self, token_ids: list[int]) -> list[int]:
        """Longest valid prefix of token_ids (spec-decode validation,
        no state change)."""
        state = self.state
        out = []
        for tid in token_ids:
            if tid == self.compiled.index.eos_token_id:
                if self.compiled.dfa.is_accept(state):
                    out.append(tid)
                break
            nxt = self.compiled.next_state(state, tid)
            if nxt == self.compiled.dfa.dead:
                break
            out.append(tid)
            state = nxt
        return out

    def rollback(self, num_tokens: int) -> None:
        for _ in range(min(num_tokens, len(self.state_history))):
            self.state = self.state_history.pop()
        self.terminated = False
        if self._audit is not None:
            self._audit.record_rollback(self.request_id, num_tokens)

    def fill_bitmask(self, bitmask: np.ndarray, row: int) -> None:
        words = self.compiled.bitmask_for_state(self.state)
        bitmask[row, :] = words
        if self._audit is not None:
            self._audit.record_bitmask(self.request_id, self.state,
                                       words)

    def is_terminated(self) -> bool:
        return self.terminated

    def reset(self) -> None:
        self.state = self.compiled.dfa.start
        self.state_history.clear()
        self.terminated = False
