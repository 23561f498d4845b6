"""Fixed-shape sampling metadata for the jitted TPU step.

Reference: vllm/v1/sample/tpu/metadata.py ``TPUSupportedSamplingMetadata``
— every per-request sampling knob is a padded device array so the
sampling computation never recompiles with batch composition. Host-side
the values live in the persistent ``InputBatch`` (struct-of-arrays) and
are sliced+padded per step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class SamplingMetadata(NamedTuple):
    """All arrays are padded to the request bucket [R].

    ``temperature <= 0`` marks a greedy row (reference precedent:
    vllm/v1/sample/tpu/metadata.py uses -1.0 for greedy).
    """

    temperature: jax.Array  # [R] f32; <=0 → greedy
    top_k: jax.Array  # [R] i32; 0 → disabled
    top_p: jax.Array  # [R] f32; 1.0 → disabled
    min_p: jax.Array  # [R] f32; 0.0 → disabled
    # per-request fold-in for reproducible seeded sampling
    seeds: jax.Array  # [R] u32
    # per-request sample position (token count): folded with the seed so
    # a seeded request reproduces its sequence independent of batch
    # composition or global step count
    sample_pos: jax.Array  # [R] i32
    # static python bools — part of the jit cache key via closure
    all_greedy: bool = True
    need_top_k: bool = False
    need_top_p: bool = False
    need_min_p: bool = False
    # number of top logprobs to return; 0 = none. Static (bucketed by
    # the runner to limit recompiles).
    max_num_logprobs: int = 0
    # ---- penalties (None unless a scheduled request uses them) -----
    # presence/frequency/repetition per row [R] f32
    presence_penalties: Optional[jax.Array] = None
    frequency_penalties: Optional[jax.Array] = None
    repetition_penalties: Optional[jax.Array] = None
    # token history [R, Lmax] (-1 padded) + prompt boundary [R]
    token_history: Optional[jax.Array] = None
    num_prompt_tokens: Optional[jax.Array] = None
    need_penalties: bool = False
    # ---- additive logit bias: (token_id, bias) pairs, id -1 = pad --
    bias_token_ids: Optional[jax.Array] = None  # [R, B]
    bias_values: Optional[jax.Array] = None  # [R, B] f32
    need_logit_bias: bool = False
    # ---- speculative decoding: per-position draft token (-1 = no
    # draft at this position); enables device-side rejection sampling
    draft_token_ids: Optional[jax.Array] = None  # [R] i32
    need_rejection: bool = False
