"""Classic two-model speculative decoding: a small standalone decoder
proposes drafts for a large target.

Reference capability: vllm/v1/spec_decode/eagle.py:41 — the
EagleProposer covers BOTH EAGLE heads and separate draft models
(method="draft_model"); the draft consumes the same shifted token
stream as EAGLE (token t_{p+1} at position p, the freshly accepted
token at the last row), just without the target-hidden input.

TPU-native design: the wrapper instantiates the draft checkpoint's
own model family via the registry and implements the EAGLE draft
interface, so the whole proposal stays fused inside the target's
jitted step. The draft's KV cache rides as trailing layers of the
target's stacked cache; since a separate draft generally has a
narrower KV row (fewer heads / smaller head_dim), the wrapper slices
its width range out of the target-width pages and writes it back —
page tables and slot mappings are shared with the target verbatim.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata


class SeparateDraftModel:
    """EAGLE-draft interface around an independent decoder LM."""

    # the runner's shifted-input convention applies (reference:
    # EagleProposer feeds draft models the shifted stream too)
    SHIFT_INPUTS = True

    def __init__(self, cfg: ModelConfig, target_cfg: ModelConfig):
        from vllm_main_modify_tpu.models.registry import create_model

        self.cfg = cfg
        self.inner = create_model(cfg)
        kvh, hd, L = self.inner.kv_cache_spec()
        self.L = L
        self._kv_heads = kvh
        self._head_dim = hd
        assert cfg.vocab_size == target_cfg.vocab_size, (
            "draft and target must share a tokenizer/vocab "
            f"({cfg.vocab_size} vs {target_cfg.vocab_size})")

    def param_specs(self):
        return self.inner.param_specs()

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self._kv_heads, self._head_dim, self.L

    # ------------------------------------------------------------------

    def embed(self, params: dict, target_params: dict,
              input_ids: jax.Array) -> jax.Array:
        return jnp.take(params["embed_tokens"], input_ids, axis=0)

    def __call__(
        self,
        params: dict,  # the draft subtree
        target_params: dict,
        input_ids: jax.Array,  # [T] shifted next-token ids
        hidden: jax.Array,  # [T, H_target] — unused (independent LM)
        positions: jax.Array,  # [T]
        kv_caches: jax.Array,  # FULL stacked cache, target width
        attn_meta: AttentionMetadata,
        layer_offset: int,
        use_pallas: Optional[bool] = None,
    ) -> tuple[jax.Array, jax.Array]:
        del hidden
        # slice the draft's layer range and width range out of the
        # target-width pages: [L_d, P, page, 2K_t, D_t] -> flat width
        # -> [:w_d] -> the draft's [.., 2K_d, D_d]
        kv_d = jax.lax.slice_in_dim(kv_caches, layer_offset,
                                    layer_offset + self.L, axis=0)
        full_shape = kv_d.shape  # [L_d, P, page, ...]
        lead = full_shape[:3]
        w_t = 1
        for d in full_shape[3:]:
            w_t *= d
        w_d = 2 * self._kv_heads * self._head_dim
        assert w_d <= w_t, (
            f"draft KV row ({w_d}) wider than the target's ({w_t}); "
            "use a smaller draft model")
        flat = kv_d.reshape(*lead, w_t)
        kv_in = jax.lax.slice_in_dim(flat, 0, w_d, axis=3).reshape(
            *lead, 2 * self._kv_heads, self._head_dim)

        out, kv_out = self.inner(params, input_ids, positions, kv_in,
                                 attn_meta, use_pallas=use_pallas)

        flat = jax.lax.dynamic_update_slice_in_dim(
            flat, kv_out.reshape(*lead, w_d), 0, axis=3)
        kv_caches = jax.lax.dynamic_update_slice_in_dim(
            kv_caches, flat.reshape(full_shape), layer_offset, axis=0)
        return out, kv_caches

    def compute_logits(self, params: dict, target_params: dict,
                       target_model, hidden: jax.Array) -> jax.Array:
        return self.inner.compute_logits(params, hidden)

    def propose_token(self, params: dict, target_params: dict,
                      target_model, hidden: jax.Array) -> jax.Array:
        return jnp.argmax(
            self.compute_logits(params, target_params, target_model,
                                hidden), axis=-1).astype(jnp.int32)
