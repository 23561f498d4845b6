"""Gated delta rule (Qwen3-Next linear attention).

Reference: HF modeling_qwen3_next torch_recurrent_gated_delta_rule /
torch_chunk_gated_delta_rule + vllm/model_executor/layers/fla (the
flash-linear-attention kernels). Per token and per value head, with
state S in R^{Dk x Dv}:

    S   <- S * exp(g_t)                         (scalar decay)
    mem  = k_tᵀ S
    S   <- S + k_t ⊗ (v_t - mem) * beta_t       (delta rule)
    o_t  = q_tᵀ S

q/k are L2-normalized (eps 1e-6) and q is scaled by Dk^-1/2.

TPU note: the delta update `(I - beta k kᵀ)` makes the recurrence
non-associative in vector form, so unlike the Mamba mixers this is a
SEQUENTIAL `fori_loop` over the packed batch, reading/writing each
request's state slot in place — a correctness-first form; the chunked
WY-representation kernel is the planned fast path."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_main_modify_tpu.layers.mamba import RaggedSegInfo


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def gated_delta_rule_ragged(
    q: jax.Array,  # [T, Hv, Dk]
    k: jax.Array,  # [T, Hv, Dk]
    v: jax.Array,  # [T, Hv, Dv]
    g: jax.Array,  # [T, Hv] f32 log-decay
    beta: jax.Array,  # [T, Hv] f32
    states: jax.Array,  # [S, Hv, Dk, Dv] f32 per-slot recurrent state
    seg: RaggedSegInfo,
) -> tuple[jax.Array, jax.Array]:
    """Returns (out [T, Hv, Dv] f32, new states)."""
    t_total, hv, dk = q.shape
    dv = v.shape[-1]
    qf = _l2norm(q.astype(jnp.float32)) * (dk**-0.5)
    kf = _l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    out0 = jnp.zeros((t_total, hv, dv), jnp.float32)
    # padded tokens write to their (clamped) row's slot but with a
    # no-op update: decay 1, beta 0 — the state passes through
    decay = jnp.where(seg.valid_tok[:, None], jnp.exp(gf), 1.0)
    bf = jnp.where(seg.valid_tok[:, None], bf, 0.0)
    # a request's FIRST chunk must not read a reused slot's stale state
    start_fresh = seg.is_first & seg.fresh_req[seg.req_of_tok]

    def body(t, carry):
        states, out = carry
        slot = seg.state_slots[seg.req_of_tok[t]]
        s = states[slot]  # [Hv, Dk, Dv]
        s = jnp.where(start_fresh[t], 0.0, s)
        s = s * decay[t][:, None, None]
        mem = jnp.einsum("hkv,hk->hv", s, kf[t])
        delta = (vf[t] - mem) * bf[t][:, None]
        s = s + kf[t][:, :, None] * delta[:, None, :]
        o_t = jnp.einsum("hkv,hk->hv", s, qf[t])
        states = jax.lax.dynamic_update_index_in_dim(
            states, s, slot, 0)
        out = jax.lax.dynamic_update_index_in_dim(out, o_t, t, 0)
        return states, out

    states, out = jax.lax.fori_loop(0, t_total, body, (states, out0))
    return out, states


def lightning_attention_ragged(
    q: jax.Array,  # [T, H, D]
    k: jax.Array,  # [T, H, D]
    v: jax.Array,  # [T, H, D]
    decay: jax.Array,  # [H] f32 per-head decay exp(-slope)
    states: jax.Array,  # [S, H, D, D] f32
    seg: RaggedSegInfo,
) -> tuple[jax.Array, jax.Array]:
    """MiniMax lightning attention (HF MiniMaxLightningAttention):
    per-head exponentially-decayed linear attention

        S_t = λ_h S_{t-1} + k_t v_tᵀ ;  o_t = q_t S_t

    — the beta-free, decay-static special case of the delta rule.
    Sequential over the packed batch like gated_delta_rule_ragged."""
    t_total, h, d = q.shape
    qf = q.astype(jnp.float32)
    kf = jnp.where(seg.valid_tok[:, None, None],
                   k.astype(jnp.float32), 0.0)
    vf = v.astype(jnp.float32)
    lam = jnp.where(seg.valid_tok[:, None], decay[None, :], 1.0)
    out0 = jnp.zeros((t_total, h, v.shape[-1]), jnp.float32)
    start_fresh = seg.is_first & seg.fresh_req[seg.req_of_tok]

    def body(t, carry):
        states, out = carry
        slot = seg.state_slots[seg.req_of_tok[t]]
        s = states[slot]
        s = jnp.where(start_fresh[t], 0.0, s)
        s = s * lam[t][:, None, None] + \
            kf[t][:, :, None] * vf[t][:, None, :]
        o_t = jnp.einsum("hkv,hk->hv", s, qf[t])
        states = jax.lax.dynamic_update_index_in_dim(
            states, s, slot, 0)
        out = jax.lax.dynamic_update_index_in_dim(out, o_t, t, 0)
        return states, out

    states, out = jax.lax.fori_loop(0, t_total, body, (states, out0))
    return out, states
