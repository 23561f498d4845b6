"""StructuredOutputManager: async grammar compile + per-step bitmask.

Reference: vllm/v1/structured_output/__init__.py
``StructuredOutputManager`` (:32) — grammar compilation in a thread
pool (:124), per-step ``grammar_bitmask`` assembly (:160), advance on
accepted tokens via the scheduler hook (scheduler.py:948-954).
"""

from __future__ import annotations

import json
import logging
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional

import numpy as np

from vllm_main_modify_tpu.sampling_params import StructuredOutputParams
from vllm_main_modify_tpu.structured_output.audit_tracker import \
    get_audit_tracker
from vllm_main_modify_tpu.structured_output.grammar import (
    CompiledGrammar, Grammar)
from vllm_main_modify_tpu.structured_output.json_schema import (
    choice_to_regex, json_value_regex, schema_to_regex)
from vllm_main_modify_tpu.structured_output.regex_engine import \
    compile_regex
from vllm_main_modify_tpu.structured_output.token_index import TokenIndex

logger = logging.getLogger(__name__)


def spec_to_regex(params: StructuredOutputParams) -> str:
    if params.regex is not None:
        return params.regex
    if params.json_schema is not None:
        return schema_to_regex(params.json_schema)
    if params.choice is not None:
        return choice_to_regex(list(params.choice))
    if params.grammar is not None:  # handled by the EBNF PDA backend
        raise ValueError(
            "EBNF grammars are not supported by the regex-DFA backend; "
            "use json_schema, regex, or choice")
    if params.json_object:
        return json_value_regex()
    raise ValueError("empty structured-output spec")


class StructuredOutputRequest:
    """Attached to Request.structured_output_request; `.grammar`
    becomes non-None once compilation finishes."""

    def __init__(self, future: "Future[CompiledGrammar]",
                 request_id: str, audit) -> None:
        self._future = future
        self._request_id = request_id
        self._audit = audit
        self._grammar: Optional[Grammar] = None
        self.error: Optional[str] = None

    @property
    def grammar(self) -> Optional[Grammar]:
        if self._grammar is None and self._future.done():
            try:
                compiled = self._future.result()
            except Exception as e:  # noqa: BLE001
                self.error = str(e)
                if self._audit is not None:
                    self._audit.record_error(self._request_id, str(e))
                raise
            self._grammar = Grammar(compiled,
                                    request_id=self._request_id,
                                    audit=self._audit)
        return self._grammar

    def is_ready(self) -> bool:
        return self._future.done()


class StructuredOutputManager:

    def __init__(self, tokenizer, vocab_size: int,
                 max_workers: int = 4) -> None:
        self.tokenizer = tokenizer
        self.vocab_size = vocab_size
        self._index: Optional[TokenIndex] = None
        self._executor = ThreadPoolExecutor(
            max_workers=max_workers,
            thread_name_prefix="grammar-compile")
        # compiled-grammar cache keyed by the regex text
        self._cache: dict[str, CompiledGrammar] = {}
        self.audit = get_audit_tracker()
        self.num_words = (vocab_size + 31) // 32

    def _get_index(self) -> TokenIndex:
        if self._index is None:
            self._index = TokenIndex(self.tokenizer, self.vocab_size)
        return self._index

    # ------------------------------------------------------------------

    def add_request(self, request) -> None:
        params = request.sampling_params.structured_outputs
        assert params is not None
        if params.grammar is not None:
            self._add_ebnf_request(request, params.grammar)
            return
        try:
            pattern = spec_to_regex(params)
        except ValueError as e:
            # surfaced when the scheduler first polls readiness
            future: Future = Future()
            future.set_exception(e)
            request.structured_output_request = StructuredOutputRequest(
                future, request.request_id, self.audit)
            return
        self.audit.start_trail(request.request_id,
                               backend_type="regex_dfa",
                               grammar_spec=pattern)

        def compile_job() -> CompiledGrammar:
            compiled = self._cache.get(pattern)
            if compiled is None:
                dfa = compile_regex(pattern)
                compiled = CompiledGrammar(dfa, self._get_index())
                self._cache[pattern] = compiled
            return compiled

        future = self._executor.submit(compile_job)
        request.structured_output_request = StructuredOutputRequest(
            future, request.request_id, self.audit)

    def _add_ebnf_request(self, request, grammar_text: str) -> None:
        """CFG/EBNF path: pushdown automaton backend (ebnf.py);
        reference capability: backend_xgrammar.py full grammars."""
        from vllm_main_modify_tpu.structured_output.ebnf import \
            compile_ebnf

        self.audit.start_trail(request.request_id,
                               backend_type="ebnf_pda",
                               grammar_spec=grammar_text)
        cache_key = "ebnf:" + grammar_text

        def compile_job():
            compiled = self._cache.get(cache_key)
            if compiled is None:
                compiled = compile_ebnf(grammar_text,
                                        self._get_index())
                self._cache[cache_key] = compiled
            return compiled

        future = self._executor.submit(compile_job)
        request.structured_output_request = StructuredOutputRequest(
            future, request.request_id, self.audit)

    def grammar_ready(self, request) -> bool:
        sor = request.structured_output_request
        return sor is not None and sor.is_ready()

    def should_advance(self, request) -> bool:
        sor = request.structured_output_request
        if sor is None or not sor.is_ready():
            return False
        try:
            return sor.grammar is not None and not \
                sor.grammar.is_terminated()
        except Exception:  # compile failed
            return False

    def grammar_bitmask(
        self, requests: dict, num_scheduled_tokens: dict[str, int],
        spec_decode_tokens: dict[str, list[int]],
    ) -> tuple[dict[str, int], Optional[np.ndarray]]:
        """Assemble the step's bitmask rows for every scheduled
        structured-output request that will sample this step."""
        rows: dict[str, int] = {}
        masks: list[np.ndarray] = []
        for req_id in num_scheduled_tokens:
            request = requests.get(req_id)
            if request is None or not request.use_structured_output:
                continue
            sor = request.structured_output_request
            if sor is None or not sor.is_ready():
                continue
            try:
                grammar = sor.grammar
            except Exception:
                continue
            if grammar.is_terminated():
                continue
            # only requests completing their prompt this step sample
            n = num_scheduled_tokens[req_id]
            if request.num_computed_tokens + n < request.num_tokens:
                continue
            words = grammar.compiled.bitmask_for_state(grammar.state)
            if self.audit.is_enabled():
                self.audit.record_bitmask(req_id, grammar.state, words)
            rows[req_id] = len(masks)
            masks.append(words)
        if not masks:
            return {}, None
        return rows, np.stack(masks)

    def remove_request(self, request) -> None:
        self.audit.finalize_trail(request.request_id)
        request.structured_output_request = None

    def shutdown(self) -> None:
        self._executor.shutdown(wait=False)
