"""N-gram (prompt-lookup) draft proposer.

Reference: vllm/v1/spec_decode/ngram_proposer.py (:11, numba kernels
:169) — finds the most recent earlier occurrence of the sequence's
trailing n-gram and proposes the tokens that followed it. Pure-numpy
here (no numba in this image); vectorized sliding-window matching.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class NgramProposer:

    def __init__(self, num_speculative_tokens: int,
                 prompt_lookup_min: int = 1,
                 prompt_lookup_max: int = 4) -> None:
        self.k = num_speculative_tokens
        self.min_n = max(prompt_lookup_min, 1)
        self.max_n = max(prompt_lookup_max, self.min_n)

    def propose(self,
                token_ids: np.ndarray) -> Optional[np.ndarray]:
        """Drafts following the longest matched trailing n-gram, or
        None if nothing matches."""
        seq = np.asarray(token_ids)
        length = len(seq)
        if length < self.min_n + 1:
            return None
        for n in range(min(self.max_n, length - 1), self.min_n - 1, -1):
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
