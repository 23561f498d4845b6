"""N-gram (prompt-lookup) draft proposer.

Reference: vllm/v1/spec_decode/ngram_proposer.py (:11, numba kernels
:169) — finds the most recent earlier occurrence of the sequence's
trailing n-gram (longest n in [min_n, max_n] wins) and proposes the
tokens that followed it. The scan is a host-side hot loop running
every step for every request; numba is not in this image, so the
production path is the C++ kernel in native/ngram.cpp (built on first
use, see native/build.py) with this vectorized-numpy fallback kept
for toolchain-less environments (VLLM_DISABLE_NATIVE=1 forces it).
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from vllm_main_modify_tpu import envs


def _load_lib():
    if envs.VLLM_DISABLE_NATIVE:
        return None
    from vllm_main_modify_tpu.native import load_native

    lib = load_native("ngram")
    if lib is None:
        return None
    i64, i32p, i64p = (ctypes.c_int64,
                       ctypes.POINTER(ctypes.c_int32),
                       ctypes.POINTER(ctypes.c_int64))
    lib.ngram_propose.restype = ctypes.c_int64
    lib.ngram_propose.argtypes = [i32p, i64, i64, i64, i64, i32p]
    lib.ngram_propose_batch.restype = None
    lib.ngram_propose_batch.argtypes = [i32p, i64p, i64p, i64, i64,
                                        i64, i64, i32p, i32p]
    return lib


class NgramProposer:

    def __init__(self, num_speculative_tokens: int,
                 prompt_lookup_min: int = 1,
                 prompt_lookup_max: int = 4) -> None:
        self.k = num_speculative_tokens
        self.min_n = max(prompt_lookup_min, 1)
        self.max_n = max(prompt_lookup_max, self.min_n)
        self._lib = _load_lib()

    # ------------------------------------------------------------------

    def propose(self,
                token_ids: np.ndarray) -> Optional[np.ndarray]:
        """Drafts following the longest matched trailing n-gram, or
        None if nothing matches."""
        seq = np.ascontiguousarray(token_ids, dtype=np.int32)
        if self._lib is not None:
            out = np.empty(self.k, dtype=np.int32)
            n = self._lib.ngram_propose(
                seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(seq), self.min_n, self.max_n, self.k,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            return out[:n] if n > 0 else None
        return self._propose_numpy(seq)

    def propose_batch(self, token_ids: np.ndarray,
                      num_tokens: np.ndarray,
                      rows: list[int]) -> dict[int, list[int]]:
        """Drafts for a set of rows of the persistent [R, max_len]
        token matrix in ONE native call (zero-copy: per-row offsets
        into the matrix). Returns {row: draft} for rows that
        matched."""
        if not rows:
            return {}
        if self._lib is None or token_ids.dtype != np.int32 or \
                not token_ids.flags.c_contiguous:
            out = {}
            for r in rows:
                d = self.propose(token_ids[r, :int(num_tokens[r])])
                if d is not None:
                    out[r] = [int(x) for x in d]
            return out
        stride = token_ids.shape[1]
        starts = np.asarray([r * stride for r in rows],
                            dtype=np.int64)
        lens = np.asarray([int(num_tokens[r]) for r in rows],
                          dtype=np.int64)
        drafts = np.empty((len(rows), self.k), dtype=np.int32)
        out_lens = np.empty(len(rows), dtype=np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        self._lib.ngram_propose_batch(
            token_ids.ctypes.data_as(i32p),
            starts.ctypes.data_as(i64p), lens.ctypes.data_as(i64p),
            len(rows), self.min_n, self.max_n, self.k,
            drafts.ctypes.data_as(i32p),
            out_lens.ctypes.data_as(i32p))
        return {
            r: drafts[i, :out_lens[i]].tolist()
            for i, r in enumerate(rows) if out_lens[i] > 0
        }

    # ------------------------------------------------------------------

    def _propose_numpy(self,
                       seq: np.ndarray) -> Optional[np.ndarray]:
        length = len(seq)
        if length < self.min_n + 1:
            return None
        for n in range(min(self.max_n, length - 1), self.min_n - 1,
                       -1):
            suffix = seq[length - n:]
            # windows over everything before the final n-gram
            body = seq[:length - 1]
            if len(body) < n:
                continue
            windows = np.lib.stride_tricks.sliding_window_view(body, n)
            hits = np.nonzero((windows == suffix).all(axis=1))[0]
            if hits.size == 0:
                continue
            # most recent occurrence whose continuation exists
            start = int(hits[-1]) + n
            if start >= length:
                continue
            draft = seq[start:start + self.k]
            if draft.size > 0:
                return draft
        return None
