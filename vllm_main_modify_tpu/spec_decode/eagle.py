"""EAGLE-style draft model for speculative decoding.

Reference capability: vllm/v1/spec_decode/eagle.py (EagleProposer) +
vllm/model_executor/models/llama_eagle.py (the draft network: embed →
fc(concat(embed, target_hidden)) → Llama decoder layers, layer 0
without input_layernorm, no final norm, lm_head shared with the target
unless the checkpoint carries its own).

TPU-native design: the whole propose pass is FUSED into the target's
jitted step (worker/model_runner.py) — the reference pays a separate
draft-model dispatch per decode step plus K-1 CUDA-graph replays; here
the target forward, verification sampling, the draft forward over all
scheduled positions, and the K-1 autoregressive draft iterations are
one device program, so speculation adds zero host→device round trips.
The draft's KV cache rides as extra trailing layers of the target's
stacked KV array (same pages, same block tables, same donation), which
is exactly the reference's single-kv-cache-group constraint
(eagle.py:984 validate_same_kv_cache_group) expressed structurally.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.activation import ACT2FN
from vllm_main_modify_tpu.layers.attention import (AttentionMetadata,
                                                   attention)
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.layers.rotary import (apply_rope,
                                                compute_inv_freq)
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _checkpoint_keys(model_dir: str) -> set:
    """Tensor names present in the draft checkpoint (empty for dummy
    loads / missing dirs)."""
    try:
        from vllm_main_modify_tpu.models.loader import _hf_tensor_index
        return set(_hf_tensor_index(model_dir))
    except Exception:
        return set()


class EagleDraftModel:
    """The draft network. Weight layout mirrors models/llama.py
    (stacked layer axis) so the loader machinery is reused verbatim."""

    def __init__(self, cfg: ModelConfig, target_cfg: ModelConfig):
        self.cfg = cfg
        self.num_q = cfg.num_attention_heads
        self.num_kv = cfg.num_kv_heads
        self.head_dim = cfg.head_dim
        self.hidden = cfg.hidden_size
        self.inter = cfg.intermediate_size
        self.L = cfg.num_layers
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, cfg.rope_theta,
                             cfg.rope_scaling))
        act = getattr(cfg.hf_config, "hidden_act", "silu") \
            if cfg.hf_config is not None else "silu"
        self.act_fn = ACT2FN[act]
        # EAGLE-1 attention geometry must match the target so the draft
        # KV pages stack onto the target cache
        assert (cfg.num_kv_heads == target_cfg.num_kv_heads
                and cfg.head_dim == target_cfg.head_dim), (
                    "EAGLE draft KV geometry must match the target "
                    f"({cfg.num_kv_heads}x{cfg.head_dim} vs "
                    f"{target_cfg.num_kv_heads}x{target_cfg.head_dim})")
        assert cfg.hidden_size == target_cfg.hidden_size, (
            "EAGLE draft hidden size must match the target")

        keys = _checkpoint_keys(cfg.model)
        # yuhuili/EAGLE-* checkpoints use bare keys; some re-exports
        # prefix with "model."
        self.key_prefix = "model." if any(
            k.startswith("model.layers.0.") for k in keys) else ""
        self.has_fc_bias = (self.key_prefix + "fc.bias") in keys
        self.has_embed = (self.key_prefix +
                          "embed_tokens.weight") in keys
        self.has_lm_head = "lm_head.weight" in keys
        # layer 0 has no input_layernorm (EAGLE deletes it; the key is
        # absent from real checkpoints)
        self.has_ln0 = (self.key_prefix +
                        "layers.0.input_layernorm.weight") in keys

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        pre = self.key_prefix
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        L, H, I = self.L, self.hidden, self.inter
        t = transpose2d

        def stk(path, shape, spec, hf_key, transform=t, off=0):
            return ParamSpec(path, (L - off, *shape), spec,
                             pre + hf_key, stacked=True,
                             transform=transform, layer_offset=off)

        specs = [
            ParamSpec("fc", (2 * H, H), P(None, None), pre + "fc.weight",
                      transform=t),
            stk("layers.q_proj", (H, qd), P(None, None, "model"),
                "layers.{i}.self_attn.q_proj.weight"),
            stk("layers.k_proj", (H, kd), P(None, None, "model"),
                "layers.{i}.self_attn.k_proj.weight"),
            stk("layers.v_proj", (H, kd), P(None, None, "model"),
                "layers.{i}.self_attn.v_proj.weight"),
            stk("layers.o_proj", (qd, H), P(None, "model", None),
                "layers.{i}.self_attn.o_proj.weight"),
            stk("layers.post_attention_layernorm", (H, ), P(None, None),
                "layers.{i}.post_attention_layernorm.weight",
                transform=None),
            stk("layers.gate_proj", (H, I), P(None, None, "model"),
                "layers.{i}.mlp.gate_proj.weight"),
            stk("layers.up_proj", (H, I), P(None, None, "model"),
                "layers.{i}.mlp.up_proj.weight"),
            stk("layers.down_proj", (I, H), P(None, "model", None),
                "layers.{i}.mlp.down_proj.weight"),
        ]
        if self.has_fc_bias:
            specs.append(
                ParamSpec("fc_bias", (H, ), P(), pre + "fc.bias",
                          transform=None))
        if self.has_embed:
            specs.append(
                ParamSpec("embed_tokens", (c.vocab_size, H),
                          P("model", None), pre + "embed_tokens.weight",
                          transform=None))
        if self.has_lm_head:
            specs.append(
                ParamSpec("lm_head", (H, c.vocab_size), P(None, "model"),
                          "lm_head.weight", transform=t))
        if self.has_ln0:
            specs.append(
                stk("input_layernorm_full", (H, ), P(None, None),
                    "layers.{i}.input_layernorm.weight",
                    transform=None))
        elif L > 1:
            specs.append(
                stk("input_layernorm_rest", (H, ), P(None, None),
                    "layers.{i}.input_layernorm.weight",
                    transform=None, off=1))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, self.L

    # ------------------------------------------------------------------

    def embed(self, params: dict, target_params: dict,
              input_ids: jax.Array) -> jax.Array:
        table = params.get("embed_tokens",
                           target_params["embed_tokens"])
        return jnp.take(table, input_ids, axis=0)

    def __call__(
        self,
        params: dict,  # the draft subtree
        target_params: dict,  # for shared embed / lm_head
        input_ids: jax.Array,  # [T] next-token ids (shifted)
        hidden: jax.Array,  # [T, H] target hidden at same positions
        positions: jax.Array,  # [T]
        kv_caches: jax.Array,  # FULL stacked cache [L_tot, P, pg, W]
        attn_meta: AttentionMetadata,
        layer_offset: int,  # draft layers live at L_target + l
        use_pallas: Optional[bool] = None,
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        emb = self.embed(params, target_params, input_ids)
        x = jnp.concatenate([emb, hidden.astype(emb.dtype)],
                            axis=-1) @ params["fc"]
        if "fc_bias" in params:
            x = x + params["fc_bias"]
        t = x.shape[0]
        layers = params["layers"]
        for l in range(self.L):
            w = jax.tree.map(lambda a: a[l], layers)
            res = x
            if self.has_ln0:
                h = rms_norm(x, params["input_layernorm_full"][l],
                             cfg.rms_norm_eps)
            elif l > 0:
                h = rms_norm(x, params["input_layernorm_rest"][l - 1],
                             cfg.rms_norm_eps)
            else:
                h = x  # EAGLE: layer 0 input_layernorm removed
            q = (h @ w["q_proj"]).reshape(t, self.num_q, self.head_dim)
            k = (h @ w["k_proj"]).reshape(t, self.num_kv, self.head_dim)
            v = (h @ w["v_proj"]).reshape(t, self.num_kv, self.head_dim)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            o, kv_caches = attention(q, k, v, kv_caches,
                                     layer_offset + l, attn_meta,
                                     self.sm_scale,
                                     use_pallas=use_pallas)
            x = res + o.reshape(t, -1) @ w["o_proj"]
            res = x
            h = rms_norm(x, w["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            h = self.act_fn(h @ w["gate_proj"], h @ w["up_proj"])
            x = res + h @ w["down_proj"]
        # EAGLE output: hidden + residual with NO final norm
        # (llama_eagle.py forward returns hidden_states + residual)
        return x, kv_caches

    def compute_logits(self, params: dict, target_params: dict,
                       target_model, hidden: jax.Array) -> jax.Array:
        if "lm_head" in params:
            return hidden.astype(jnp.float32) @ params[
                "lm_head"].astype(jnp.float32)
        return target_model.compute_logits(target_params, hidden)

    def propose_token(self, params: dict, target_params: dict,
                      target_model, hidden: jax.Array) -> jax.Array:
        return jnp.argmax(
            self.compute_logits(params, target_params, target_model,
                                hidden), axis=-1).astype(jnp.int32)


def make_draft_config(draft_dir: str,
                      target_cfg: ModelConfig) -> ModelConfig:
    """ModelConfig for the draft checkpoint (reference:
    SpeculativeConfig.draft_model_config, vllm/config/speculative.py)."""
    return ModelConfig(model=draft_dir, dtype=target_cfg.dtype,
                       max_model_len=target_cfg.max_model_len)


class Eagle3DraftModel:
    """EAGLE-3 draft network (reference:
    vllm/model_executor/models/llama_eagle3.py + EagleProposer): ONE
    decoder layer whose attention reads concat(input_layernorm(embeds),
    hidden_norm(hidden)) through 2H-wide q/k/v, an fc that combines the
    target's THREE aux hidden states [T, 3H] -> [T, H], a final norm
    before the draft lm_head over a REDUCED draft vocabulary, and the
    d2t table mapping draft token ids back to target ids."""

    is_eagle3 = True

    def __init__(self, cfg: ModelConfig, target_cfg: ModelConfig):
        self.cfg = cfg
        self.num_q = cfg.num_attention_heads
        self.num_kv = cfg.num_kv_heads
        self.head_dim = cfg.head_dim
        self.hidden = cfg.hidden_size
        self.inter = cfg.intermediate_size
        self.L = 1  # single midlayer
        self.sm_scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.head_dim, cfg.rope_theta,
                             cfg.rope_scaling))
        act = getattr(cfg.hf_config, "hidden_act", "silu") \
            if cfg.hf_config is not None else "silu"
        self.act_fn = ACT2FN[act]
        hf = cfg.hf_config
        self.target_hidden = getattr(hf, "target_hidden_size",
                                     None) or target_cfg.hidden_size
        self.draft_vocab = getattr(hf, "draft_vocab_size",
                                   None) or cfg.vocab_size
        self.target_vocab = target_cfg.vocab_size
        self.norm_before_residual = bool(
            getattr(hf, "norm_before_residual", False))
        assert (cfg.num_kv_heads == target_cfg.num_kv_heads
                and cfg.head_dim == target_cfg.head_dim), (
                    "EAGLE-3 draft KV geometry must match the target")
        keys = _checkpoint_keys(cfg.model)
        self.key_prefix = "model." if any(
            k.startswith("model.midlayer.") or
            k.startswith("model.fc.") for k in keys) else ""
        mid = self.key_prefix + "midlayer."
        self.layer_key = "midlayer." if (
            mid + "self_attn.q_proj.weight") in keys or not keys \
            else "layers.0."
        self.has_d2t = (self.key_prefix + "d2t") in keys or \
            "d2t" in keys

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        c = self.cfg
        pre = self.key_prefix
        lk = pre + self.layer_key
        qd = self.num_q * self.head_dim
        kd = self.num_kv * self.head_dim
        H, I = self.hidden, self.inter
        tH = self.target_hidden
        t = transpose2d

        specs = [
            ParamSpec("fc", (3 * tH, H), P(None, None),
                      pre + "fc.weight", transform=t),
            ParamSpec("embed_tokens", (c.vocab_size, H),
                      P("model", None), pre + "embed_tokens.weight",
                      transform=None),
            ParamSpec("input_layernorm", (H, ), P(),
                      lk + "input_layernorm.weight", transform=None),
            ParamSpec("hidden_norm", (H, ), P(),
                      lk + "hidden_norm.weight", transform=None),
            ParamSpec("q_proj", (2 * H, qd), P(None, "model"),
                      lk + "self_attn.q_proj.weight", transform=t),
            ParamSpec("k_proj", (2 * H, kd), P(None, "model"),
                      lk + "self_attn.k_proj.weight", transform=t),
            ParamSpec("v_proj", (2 * H, kd), P(None, "model"),
                      lk + "self_attn.v_proj.weight", transform=t),
            ParamSpec("o_proj", (qd, H), P("model", None),
                      lk + "self_attn.o_proj.weight", transform=t),
            ParamSpec("post_attention_layernorm", (H, ), P(),
                      lk + "post_attention_layernorm.weight",
                      transform=None),
            ParamSpec("gate_proj", (H, I), P(None, "model"),
                      lk + "mlp.gate_proj.weight", transform=t),
            ParamSpec("up_proj", (H, I), P(None, "model"),
                      lk + "mlp.up_proj.weight", transform=t),
            ParamSpec("down_proj", (I, H), P("model", None),
                      lk + "mlp.down_proj.weight", transform=t),
            ParamSpec("final_norm", (H, ), P(), pre + "norm.weight",
                      transform=None),
            ParamSpec("lm_head", (H, self.draft_vocab),
                      P(None, "model"), "lm_head.weight", transform=t),
        ]
        if self.has_d2t:
            import numpy as np

            specs.append(
                ParamSpec("d2t", (self.draft_vocab, ), P(),
                          (self.key_prefix + "d2t")
                          if (self.key_prefix + "d2t") else "d2t",
                          transform=lambda x: np.asarray(
                              x, np.int32)))
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self.num_kv, self.head_dim, 1

    # ------------------------------------------------------------------

    def combine(self, params: dict, aux: jax.Array) -> jax.Array:
        """[T, 3*target_H] aux hidden states → [T, H]."""
        return aux @ params["fc"]

    def embed(self, params: dict, target_params: dict,
              input_ids: jax.Array) -> jax.Array:
        return jnp.take(params["embed_tokens"], input_ids, axis=0)

    def __call__(
        self,
        params: dict,
        target_params: dict,
        input_ids: jax.Array,  # [T]
        hidden: jax.Array,  # [T, H] combined/chained draft hidden
        positions: jax.Array,
        kv_caches: jax.Array,
        attn_meta: AttentionMetadata,
        layer_offset: int,
        use_pallas=None,
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        emb = self.embed(params, target_params, input_ids)
        emb_n = rms_norm(emb, params["input_layernorm"],
                         cfg.rms_norm_eps)
        h_n = rms_norm(hidden.astype(emb.dtype),
                       params["hidden_norm"], cfg.rms_norm_eps)
        res = h_n if self.norm_before_residual else \
            hidden.astype(emb.dtype)
        x2 = jnp.concatenate([emb_n, h_n], axis=-1)  # [T, 2H]
        t = x2.shape[0]
        q = (x2 @ params["q_proj"]).reshape(t, self.num_q,
                                            self.head_dim)
        k = (x2 @ params["k_proj"]).reshape(t, self.num_kv,
                                            self.head_dim)
        v = (x2 @ params["v_proj"]).reshape(t, self.num_kv,
                                            self.head_dim)
        q, k = apply_rope(q, k, positions, self.inv_freq)
        o, kv_caches = attention(q, k, v, kv_caches, layer_offset,
                                 attn_meta, self.sm_scale,
                                 use_pallas=use_pallas)
        x = res + o.reshape(t, -1) @ params["o_proj"]
        res = x
        h = rms_norm(x, params["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        h = self.act_fn(h @ params["gate_proj"], h @ params["up_proj"])
        x = res + h @ params["down_proj"]
        # returns hidden_prenorm (HF forward's second output): the
        # chaining input of the next draft iteration
        return x, kv_caches

    def propose_token(self, params: dict, target_params: dict,
                      target_model, hidden: jax.Array) -> jax.Array:
        """Greedy draft token in TARGET vocab ids: final norm →
        draft lm_head → argmax → d2t translation."""
        h = rms_norm(hidden, params["final_norm"],
                     self.cfg.rms_norm_eps)
        logits = h.astype(jnp.float32) @ params["lm_head"].astype(
            jnp.float32)
        did = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if "d2t" in params:
            d2t = params["d2t"].astype(jnp.int32)  # dummy loads: f32
            return did + jnp.take(d2t, did)
        return did
