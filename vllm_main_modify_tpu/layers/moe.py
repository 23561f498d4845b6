"""Fused Mixture-of-Experts FFN.

Reference: vllm/model_executor/layers/fused_moe/ (32-file subsystem:
Triton grouped GEMM, all2all dispatchers) and its Pallas TPU path
moe_pallas.py:25 (topk → expert histogram → megablox ``gmm``).
TPU-native here: ``jax.lax.ragged_dot`` IS the megablox grouped
matmul — tokens are sorted by expert, run through grouped GEMMs with
per-expert group sizes, then unsorted and combined with router
weights. Under GSPMD the expert axis shards over the mesh for EP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class EplbExpertWeight:
    """One stacked expert tensor in PHYSICAL layout plus the
    logical→physical routing map (EPLB; reference:
    vllm/distributed/eplb/eplb_state.py + rebalance_execute.py).

    ``phys``: [L, P, ...] physical expert weights (P >= E, hot experts
    replicated). ``log2phy``: [L, E, R] physical slot per (logical,
    replica), -1 padded. ``logcnt``: [L, E] live replica count.
    All leaves lead with the layer axis so the scaffolds' per-layer
    tree slicing works unchanged; moe_apply detects the container and
    routes logical top-k ids through the map with round-robin replica
    choice. Rebalancing swaps the arrays in the params tree — shapes
    are constant, so no recompilation."""

    phys: jax.Array
    log2phy: jax.Array
    logcnt: jax.Array

    def tree_flatten(self):
        return (self.phys, self.log2phy, self.logcnt), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.phys.shape

    @property
    def dtype(self):
        return self.phys.dtype


def eplb_translate(experts: jax.Array, log2phy: jax.Array,
                   logcnt: jax.Array) -> jax.Array:
    """Logical top-k ids [T, k] → physical slot ids, spreading tokens
    round-robin across each expert's replicas (parallel/eplb.py
    translate_experts, in-graph version)."""
    t = experts.shape[0]
    tok = jnp.arange(t, dtype=jnp.int32)[:, None]
    replica = tok % jnp.take(logcnt, experts)
    return jnp.take(log2phy.reshape(-1),
                    experts * log2phy.shape[1] + replica)


def group_limited_topk(
    probs: jax.Array,  # [T, E] f32
    top_k: int,
    n_group: int,
    topk_group: int,
) -> tuple[jax.Array, jax.Array]:
    """DeepSeek group-limited greedy routing (reference:
    fused_moe grouped_topk / HF DeepseekV2MoEGate
    topk_method='group_limited_greedy'): experts partition into
    ``n_group`` groups; only the ``topk_group`` groups with the
    highest per-group max score are eligible for the final top-k."""
    t, num_experts = probs.shape
    group_scores = probs.reshape(t, n_group, -1).max(axis=-1)
    _, group_idx = jax.lax.top_k(group_scores, topk_group)
    group_mask = jnp.sum(jax.nn.one_hot(group_idx, n_group,
                                        dtype=probs.dtype), axis=1)
    mask = jnp.repeat(group_mask, num_experts // n_group, axis=-1)
    return jax.lax.top_k(probs * mask, top_k)


def moe_ffn(
    x: jax.Array,  # [T, H]
    router_weight: jax.Array,  # [H, E]
    w_gate: jax.Array,  # [E, H, I]
    w_up: jax.Array,  # [E, H, I]
    w_down: jax.Array,  # [E, I, H]
    top_k: int,
    act_fn: Callable,
    renormalize: bool = True,
    n_group: int = 0,
    topk_group: int = 0,
    router_bias: Optional[jax.Array] = None,  # [E]
    biases: Optional[tuple] = None,  # (b_gate[E,I], b_up[E,I], b_down[E,H])
    return_counts: bool = False,
) -> jax.Array:
    """Top-k routed expert FFN (SwiGLU experts). With
    ``return_counts`` also returns the per-LOGICAL-expert token
    histogram [E] int32 (EPLB load tracking)."""
    t, hidden = x.shape
    num_experts = router_weight.shape[1]

    router_logits = (x.astype(jnp.float32) @
                     router_weight.astype(jnp.float32))  # [T, E]
    if router_bias is not None:
        router_logits = router_logits + \
            router_bias.astype(jnp.float32)[None, :]
    probs = jax.nn.softmax(router_logits, axis=-1)
    if n_group > 1:
        weights, experts = group_limited_topk(probs, top_k, n_group,
                                              topk_group)
    else:
        weights, experts = jax.lax.top_k(probs, top_k)  # [T, k]
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    y = moe_apply(x, weights, experts, w_gate, w_up, w_down, act_fn,
                  biases=biases)
    if return_counts:
        counts = jnp.bincount(experts.reshape(-1),
                              length=num_experts).astype(jnp.int32)
        return y, counts
    return y


def moe_apply(
    x: jax.Array,  # [T, H]
    weights: jax.Array,  # [T, k] f32 combine weights
    experts: jax.Array,  # [T, k] int expert ids
    w_gate: jax.Array,  # [E, H, I]
    w_up: jax.Array,  # [E, H, I]
    w_down: jax.Array,  # [E, I, H]
    act_fn: Callable,
    biases: Optional[tuple] = None,  # per-expert (gate, up, down)
    apply_weight_on_input: bool = False,  # Llama4: scale x, not y
) -> jax.Array:
    """Grouped-GEMM expert application for an already-routed batch
    (routing variants — softmax/sigmoid, group-limited, bias-corrected
    — live in the callers; this is the shared ragged_dot machinery).

    Expert weights may arrive as :class:`EplbExpertWeight` — logical
    top-k ids then translate through the load-balancer's placement map
    and the grouped GEMM runs over the PHYSICAL expert axis."""
    t, hidden = x.shape
    if isinstance(w_gate, EplbExpertWeight):
        experts = eplb_translate(experts, w_gate.log2phy,
                                 w_gate.logcnt)
        w_gate = w_gate.phys
        w_up = w_up.phys if isinstance(w_up, EplbExpertWeight) \
            else w_up
        w_down = w_down.phys if isinstance(w_down, EplbExpertWeight) \
            else w_down
    num_experts = w_gate.shape[0]
    top_k = experts.shape[1]

    # sort (token, k) slots by expert so each expert's tokens are
    # contiguous → grouped matmul
    flat_experts = experts.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_experts)  # stable
    token_idx = order // top_k  # source token of each sorted slot
    xs = jnp.take(x, token_idx, axis=0)  # [T*k, H]
    w_sorted_in = jnp.take(weights.reshape(-1), order)  # [T*k]
    if apply_weight_on_input:
        # the routing weight multiplies the expert INPUT (Llama4) —
        # not equivalent to output scaling through the nonlinearity
        xs = (xs.astype(jnp.float32) *
              w_sorted_in[:, None]).astype(xs.dtype)
    group_sizes = jnp.bincount(flat_experts,
                               length=num_experts).astype(jnp.int32)

    gate = jax.lax.ragged_dot(xs, w_gate, group_sizes)  # [T*k, I]
    up = jax.lax.ragged_dot(xs, w_up, group_sizes)
    if biases is not None:
        # per-expert biases (GPT-OSS): gather by each sorted slot's
        # expert id
        e_sorted = jnp.take(flat_experts, order)  # [T*k]
        b_gate, b_up, b_down = biases
        gate = gate + jnp.take(b_gate, e_sorted, axis=0)
        up = up + jnp.take(b_up, e_sorted, axis=0)
    h = act_fn(gate, up).astype(w_down.dtype)
    y = jax.lax.ragged_dot(h, w_down, group_sizes)  # [T*k, H]
    if biases is not None:
        y = y + jnp.take(b_down, e_sorted, axis=0).astype(y.dtype)

    if apply_weight_on_input:
        y = y.astype(jnp.float32)
    else:
        y = y.astype(jnp.float32) * w_sorted_in[:, None]
    out = jnp.zeros((t, hidden), dtype=jnp.float32)
    out = out.at[token_idx].add(y)
    return out.astype(x.dtype)


def deepseek_v3_routing(
    x: jax.Array,  # [T, H]
    router_weight: jax.Array,  # [H, E]
    bias: jax.Array,  # [E] e_score_correction_bias
    top_k: int,
    n_group: int,
    topk_group: int,
    renormalize: bool,
    routed_scaling: float,
) -> tuple[jax.Array, jax.Array]:
    """DeepSeek-V3 'noaux_tc' router (reference: deepseek_v2.py V3
    path / HF DeepseekV3TopkRouter): sigmoid scores; the correction
    bias shifts scores for *selection only*; group score = sum of the
    top-2 biased scores in the group; combine weights come from the
    UNBIASED sigmoid scores, optionally renormalized, scaled by
    routed_scaling_factor."""
    t = x.shape[0]
    num_experts = router_weight.shape[1]
    logits = x.astype(jnp.float32) @ router_weight.astype(jnp.float32)
    scores = jax.nn.sigmoid(logits)
    choice = scores + bias.astype(jnp.float32)[None, :]
    grouped = choice.reshape(t, n_group, num_experts // n_group)
    top2, _ = jax.lax.top_k(grouped, 2)
    group_scores = top2.sum(axis=-1)  # [T, G]
    _, group_idx = jax.lax.top_k(group_scores, topk_group)
    group_mask = jnp.sum(jax.nn.one_hot(group_idx, n_group,
                                        dtype=choice.dtype), axis=1)
    mask = jnp.repeat(group_mask, num_experts // n_group, axis=-1)
    _, experts = jax.lax.top_k(jnp.where(mask > 0, choice, 0.0), top_k)
    weights = jnp.take_along_axis(scores, experts, axis=1)
    if renormalize:
        weights = weights / (jnp.sum(weights, axis=-1,
                                     keepdims=True) + 1e-20)
    return weights * routed_scaling, experts


def moe_ffn_dense_reference(x, router_weight, w_gate, w_up, w_down,
                            top_k, act_fn,
                            renormalize: bool = True,
                            n_group: int = 0,
                            topk_group: int = 0) -> jax.Array:
    """O(T*E) oracle: run every expert on every token, mask-combine."""
    router_logits = (x.astype(jnp.float32) @
                     router_weight.astype(jnp.float32))
    probs = jax.nn.softmax(router_logits, axis=-1)
    if n_group > 1:
        weights, experts = group_limited_topk(probs, top_k, n_group,
                                              topk_group)
    else:
        weights, experts = jax.lax.top_k(probs, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    num_experts = router_weight.shape[1]
    # [E, T, H]
    gate = jnp.einsum("th,ehi->eti", x, w_gate)
    up = jnp.einsum("th,ehi->eti", x, w_up)
    h = act_fn(gate, up).astype(w_down.dtype)
    y = jnp.einsum("eti,eih->eth", h, w_down).astype(jnp.float32)
    # combine: sum over selected experts
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for j in range(top_k):
        sel = experts[:, j]  # [T]
        yj = jnp.take_along_axis(
            y, sel[None, :, None], axis=0)[0]  # [T, H]
        out = out + yj * weights[:, j:j + 1]
    return out.astype(x.dtype)
