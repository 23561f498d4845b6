"""XLA-native sampler: fixed shapes, no host sync, fully jittable.

Reference parity: vllm/v1/sample/tpu/sampler.py (``Sampler``,
``apply_top_k_top_p``) + vllm/v1/sample/sampler.py (logprobs handling).
Pipeline per step, entirely inside the jitted model step:

    raw logits → (raw logprobs for return) → temperature → top-k/top-p
    → min-p → gumbel-argmax / greedy-argmax

All masking is done with a single descending sort shared by top-k and
top-p, mirroring the reference's fused ``apply_top_k_top_p``
(vllm/v1/sample/tpu/sampler.py:169).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vllm_main_modify_tpu.sample.metadata import SamplingMetadata

_NEG_INF = float("-inf")


class SamplerOutput(NamedTuple):
    sampled: jax.Array  # [R] i32
    # present iff max_num_logprobs > 0 (else zero-size placeholders)
    logprob_token_ids: jax.Array  # [R, K+1] i32 (sampled first)
    logprobs: jax.Array  # [R, K+1] f32
    sampled_ranks: jax.Array  # [R] i32 (1-based rank of sampled token)
    # spec decode: per-position draft acceptance (zero-size unless
    # need_rejection). For accepted positions the host emits the
    # draft; at the first rejection it emits `sampled` (the recovery
    # sample, drawn from max(0, p - q) — with one-hot ngram drafts
    # that is p with the draft token excluded, renormalized).
    spec_accept: jax.Array = None  # [R] bool
    # EAGLE: next step's draft proposals, filled by the fused propose
    # pass in the step fn (worker/model_runner.py), not by sample()
    draft_tokens: jax.Array = None  # [r_pad, K] i32
    # EPLB: per-(layer, logical expert) token histogram of this step's
    # routing, filled by the step fn when load balancing is on
    eplb_counts: jax.Array = None  # [L, E] i32


def apply_top_k_top_p(logits: jax.Array, top_k: jax.Array,
                      top_p: jax.Array, need_top_k: bool,
                      need_top_p: bool) -> jax.Array:
    """Mask logits outside the per-row top-k / nucleus top-p set.

    One descending sort serves both filters (reference:
    vllm/v1/sample/tpu/sampler.py:169 ``apply_top_k_top_p``).
    """
    if not (need_top_k or need_top_p):
        return logits
    vocab = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # desc
    keep = jnp.ones_like(sorted_logits, dtype=bool)
    idx = jnp.arange(vocab, dtype=jnp.int32)[None, :]
    if need_top_k:
        k = jnp.where(top_k <= 0, vocab, top_k)[:, None]
        keep &= idx < k
    if need_top_p:
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        # keep token i if the cumulative prob of strictly-better tokens
        # is still below p (always keeps the argmax)
        cum_before = jnp.cumsum(probs, axis=-1) - probs
        keep &= cum_before < top_p[:, None]
    # smallest kept logit per row = cutoff
    cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits >= cutoff, logits, _NEG_INF)


def apply_penalties(logits: jax.Array,
                    meta: SamplingMetadata) -> jax.Array:
    """Presence/frequency penalties over OUTPUT tokens, repetition
    penalty over prompt+output (reference semantics:
    vllm/v1/sample/ops/penalties.py + csrc/sampler.cu
    apply_repetition_penalties)."""
    r, vocab = logits.shape
    hist = meta.token_history  # [R, L]
    length = hist.shape[1]
    rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), length)
    toks = hist.reshape(-1)
    pos = jnp.tile(jnp.arange(length, dtype=jnp.int32), r)
    valid = toks >= 0
    is_output = pos >= jnp.repeat(meta.num_prompt_tokens, length)
    safe = jnp.where(valid, toks, 0)

    out_counts = jnp.zeros((r, vocab), jnp.float32).at[
        rows, safe].add((valid & is_output).astype(jnp.float32))
    seen_any = jnp.zeros((r, vocab), jnp.float32).at[
        rows, safe].add(valid.astype(jnp.float32))

    rep = meta.repetition_penalties[:, None]
    seen = seen_any > 0
    logits = jnp.where(seen & (logits > 0), logits / rep,
                       jnp.where(seen, logits * rep, logits))
    logits = logits - meta.frequency_penalties[:, None] * out_counts
    logits = logits - meta.presence_penalties[:, None] *         (out_counts > 0).astype(jnp.float32)
    return logits


def apply_logit_bias(logits: jax.Array,
                     meta: SamplingMetadata) -> jax.Array:
    """Sparse additive bias (OpenAI logit_bias semantics)."""
    r = logits.shape[0]
    ids = meta.bias_token_ids  # [R, B]
    vals = meta.bias_values
    b = ids.shape[1]
    rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), b)
    flat_ids = ids.reshape(-1)
    valid = flat_ids >= 0
    safe = jnp.where(valid, flat_ids, 0)
    add = jnp.where(valid, vals.reshape(-1), 0.0)
    return logits.at[rows, safe].add(add)


def apply_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    """Drop tokens with prob < min_p * max_prob (reference:
    vllm/v1/sample/tpu/sampler.py ``apply_min_p``)."""
    probs = jax.nn.softmax(logits, axis=-1)
    threshold = jnp.max(probs, axis=-1, keepdims=True) * min_p[:, None]
    return jnp.where(probs >= threshold, logits, _NEG_INF)


def _gumbel_sample(logits: jax.Array, seeds: jax.Array,
                   sample_pos: jax.Array, step_key: jax.Array,
                   tag: int = 0) -> jax.Array:
    """Per-row gumbel-argmax. Each row's key is
    fold_in(fold_in(base, seed), position-in-sequence), so a seeded
    request reproduces its sequence across runs and batch
    compositions (vLLM per-request-generator semantics). ``tag``
    decouples independent draws at the same position (rejection
    recovery samples)."""
    r, vocab = logits.shape

    def row_bits(seed, pos):
        k = jax.random.fold_in(jax.random.fold_in(step_key, seed), pos)
        if tag:
            k = jax.random.fold_in(k, tag)
        return jax.random.uniform(k, (vocab, ), minval=1e-20, maxval=1.0)

    u = jax.vmap(row_bits)(seeds, sample_pos)
    gumbel = -jnp.log(-jnp.log(u))
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


def _row_uniform(seeds: jax.Array, sample_pos: jax.Array,
                 step_key: jax.Array, tag: int) -> jax.Array:
    """One decoupled U(0,1) per row (rejection-acceptance draws)."""

    def row_u(seed, pos):
        k = jax.random.fold_in(jax.random.fold_in(step_key, seed), pos)
        return jax.random.uniform(jax.random.fold_in(k, tag), ())

    return jax.vmap(row_u)(seeds, sample_pos)


def sample(
    logits: jax.Array,  # [R, V] f32 raw logits at sample positions
    meta: SamplingMetadata,
    step_key: jax.Array,
) -> SamplerOutput:
    """The full sampling pipeline (jit-side)."""
    r, vocab = logits.shape

    # ---- logprobs from *raw* logits (reference: sampler.py computes
    # raw logprobs before processors) --------------------------------
    k_lp = meta.max_num_logprobs

    if meta.need_penalties:
        logits = apply_penalties(logits, meta)
    if meta.need_logit_bias:
        logits = apply_logit_bias(logits, meta)

    spec_accept = None
    if meta.all_greedy:
        sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if meta.need_rejection:
            # greedy "rejection" = exact match (reference:
            # rejection_sampler.py greedy path)
            spec_accept = sampled == meta.draft_token_ids
    else:
        x = logits / jnp.maximum(meta.temperature, 1e-6)[:, None]
        x = apply_top_k_top_p(x, meta.top_k, meta.top_p,
                              meta.need_top_k, meta.need_top_p)
        if meta.need_min_p:
            x = apply_min_p(x, meta.min_p)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if meta.need_rejection:
            # device-side rejection sampling (reference:
            # vllm/v1/sample/rejection_sampler.py): with the ngram
            # proposer's implicit one-hot draft distribution q, the
            # acceptance probability is p[d] and the recovery
            # distribution max(0, p-q)/Z is p with d excluded.
            d = meta.draft_token_ids
            has_draft = d >= 0
            p = jax.nn.softmax(x, axis=-1)
            p_d = jnp.take_along_axis(
                p, jnp.clip(d, 0, vocab - 1)[:, None], axis=-1)[:, 0]
            u = _row_uniform(meta.seeds, meta.sample_pos, step_key,
                             tag=1)
            accept_rand = u < p_d
            x_excl = jnp.where(
                jnp.arange(vocab, dtype=jnp.int32)[None, :] ==
                d[:, None], _NEG_INF, x)
            recovery = _gumbel_sample(x_excl, meta.seeds,
                                      meta.sample_pos, step_key,
                                      tag=2)
            regular = _gumbel_sample(x, meta.seeds, meta.sample_pos,
                                     step_key)
            random = jnp.where(has_draft, recovery, regular)
            accept_greedy = greedy == d
            spec_accept = jnp.where(meta.temperature <= 0.0,
                                    accept_greedy, accept_rand) & \
                has_draft
        else:
            random = _gumbel_sample(x, meta.seeds, meta.sample_pos,
                                    step_key)
        sampled = jnp.where(meta.temperature <= 0.0, greedy, random)

    if k_lp > 0:
        # the row describes the token the engine will EMIT: under
        # rejection sampling an accepted position emits the draft, not
        # the recovery sample (reference: one logprob row per accepted
        # token, vllm/v1/sample/rejection_sampler.py + logprobs lists)
        emitted = sampled
        if meta.need_rejection and spec_accept is not None:
            emitted = jnp.where(spec_accept,
                                jnp.maximum(meta.draft_token_ids, 0),
                                sampled)
        logp = jax.nn.log_softmax(logits, axis=-1)
        top_lp, top_ids = jax.lax.top_k(logp, k_lp)
        sampled_lp = jnp.take_along_axis(logp, emitted[:, None],
                                         axis=-1)
        # 1-based rank (vLLM convention: rank 1 = argmax) =
        # #tokens with strictly higher logprob + 1
        ranks = 1 + jnp.sum(logp > sampled_lp, axis=-1).astype(jnp.int32)
        lp_ids = jnp.concatenate([emitted[:, None], top_ids], axis=-1)
        lps = jnp.concatenate([sampled_lp, top_lp], axis=-1)
    else:
        lp_ids = jnp.zeros((r, 0), dtype=jnp.int32)
        lps = jnp.zeros((r, 0), dtype=jnp.float32)
        ranks = jnp.zeros((r, ), dtype=jnp.int32)

    if spec_accept is None:
        spec_accept = jnp.zeros((0, ), dtype=bool)
    return SamplerOutput(sampled=sampled, logprob_token_ids=lp_ids,
                         logprobs=lps, sampled_ranks=ranks,
                         spec_accept=spec_accept)
