"""MTP (multi-token-prediction) speculative-decoding heads.

Reference capability: vllm/model_executor/models/{deepseek_mtp,
glm4_moe_mtp, ernie_mtp, qwen3_next_mtp, longcat_flash_mtp}.py — the
checkpoint ships one extra "nextn" transformer layer that predicts
token t+2 from (embedding of t+1, target hidden at t+1):

    h = eh_proj(concat(enorm(embed(next_id)), hnorm(target_hidden)))
    h = decoder_layer(h)              # a FULL family layer (MLA/MoE)
    logits = shared_head(norm(h))

TPU-native design: the MTP head implements the same draft interface
as spec_decode/eagle.py, so the whole proposal is fused into the
target's jitted step and verified by the existing device-side
rejection sampler — MTP on DeepSeek-V3/GLM-4.5 rides the same code
path as EAGLE. The inner decoder layer is not re-implemented: the
head instantiates the target's own model family with num_layers=1 and
remaps the HF keys to the checkpoint's MTP naming, so MLA matrix
absorption, MoE routing, quantization containers and GSPMD shardings
are inherited verbatim.

The draft KV cache rides as trailing layers of the target's stacked
KV array (the family geometry matches by construction); the wrapper
slices its layer range out, runs the inner model, and writes it back.

Known deltas vs the reference: (1) only the FIRST nextn layer is used
when num_nextn_predict_layers > 1 (every shipped checkpoint uses 1);
(2) when chaining K>1 draft iterations, the hidden passed to the next
iteration is the post-final-norm output (the reference chains the
pre-norm residual) — logits are identical, acceptance on deep chains
may differ marginally.
"""

from __future__ import annotations

import copy
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.layers.attention import AttentionMetadata
from vllm_main_modify_tpu.layers.normalization import rms_norm
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d

MTP_METHODS = ("deepseek_mtp", "glm4_moe_mtp", "ernie_mtp",
               "qwen3_next_mtp", "longcat_flash_mtp", "mtp")


def _clone_cfg(target_cfg: ModelConfig, method: str) -> ModelConfig:
    """A one-layer copy of the target config for the inner family
    model (hf_config deep-copied so overrides don't leak back)."""
    cfg = copy.copy(target_cfg)
    cfg.hf_config = copy.deepcopy(target_cfg.hf_config)
    cfg.num_layers = 1
    hf = cfg.hf_config
    if hf is not None:
        hf.num_hidden_layers = 1
        # the MTP block is always the "late-layer" variant of the
        # family: MoE for deepseek/glm/ernie-moe, full attention for
        # qwen3-next
        if hasattr(hf, "first_k_dense_replace"):
            hf.first_k_dense_replace = 0
        if hasattr(hf, "moe_layer_start_index"):
            hf.moe_layer_start_index = 0
        if hasattr(hf, "layer_types"):
            hf.layer_types = ["full_attention"]
    if method == "longcat_flash_mtp":
        # LongCat's MTP block is a DeepseekV2 dense layer (reference:
        # longcat_flash_mtp.py mtp_block = DeepseekV2DecoderLayer)
        cfg.architecture = "DeepseekV2ForCausalLM"
        if hf is not None:
            hf.n_routed_experts = 0
            hf.num_layers = 1
            hf.intermediate_size = getattr(
                hf, "ffn_hidden_size", None) or hf.intermediate_size
    return cfg


# per-family checkpoint key layout. {TL} = target num_hidden_layers.
_KEYMAPS = {
    "deepseek_mtp": dict(
        enorm="model.layers.{TL}.enorm.weight",
        hnorm="model.layers.{TL}.hnorm.weight",
        proj="model.layers.{TL}.eh_proj.weight",
        final_norm="model.layers.{TL}.shared_head.norm.weight",
        lm_head="model.layers.{TL}.shared_head.head.weight",
        layer_prefix=None,  # stacked keys keep "model.layers.{i}."
        layer_offset="TL",  # ... shifted past the target layers
    ),
    # GLM-4.5 MTP uses the identical SharedHead layout (reference:
    # glm4_moe_mtp.py)
    "glm4_moe_mtp": "deepseek_mtp",
    "mtp": "deepseek_mtp",  # MiMo etc. declare plain "MTPModel"
    "ernie_mtp": dict(
        enorm="model.mtp_emb_norm.0.weight",
        hnorm="model.mtp_hidden_norm.0.weight",
        proj="model.mtp_linear_proj.0.weight",
        final_norm="model.norm.weight",  # shared with the target
        lm_head="lm_head.weight",
        layer_prefix=("model.layers.{i}.", "model.mtp_block.{i}."),
        layer_offset=0,
    ),
    "qwen3_next_mtp": dict(
        enorm="mtp.pre_fc_norm_embedding.weight",
        hnorm="mtp.pre_fc_norm_hidden.weight",
        proj="mtp.fc.weight",
        final_norm="mtp.norm.weight",
        lm_head="lm_head.weight",
        layer_prefix=("model.layers.{i}.", "mtp.layers.{i}."),
        layer_offset=0,
    ),
    "longcat_flash_mtp": dict(
        enorm="model.mtp.layers.0.enorm.m.weight",
        hnorm="model.mtp.layers.0.hnorm.m.weight",
        proj="model.mtp.layers.0.eh_proj.weight",
        final_norm="model.mtp.norm.weight",
        lm_head="lm_head.weight",
        layer_prefix=("model.layers.{i}.",
                      "model.mtp.layers.{i}."),
        layer_offset=0,
    ),
}


class MtpDraftModel:
    """Draft-model interface (same as EagleDraftModel) around one
    family decoder layer loaded from the checkpoint's MTP weights."""

    def __init__(self, cfg: ModelConfig, target_cfg: ModelConfig,
                 method: str = "deepseek_mtp"):
        from vllm_main_modify_tpu.models.registry import create_model

        keymap = _KEYMAPS[method]
        if isinstance(keymap, str):
            keymap = _KEYMAPS[keymap]
        self.keymap = keymap
        self.method = method
        self.cfg = cfg
        self.target_layers_hf = target_cfg.num_layers
        self.inner_cfg = _clone_cfg(target_cfg, method)
        self.inner = create_model(self.inner_cfg)
        self.eps = getattr(target_cfg.hf_config, "rms_norm_eps", 1e-6) \
            if target_cfg.hf_config is not None else 1e-6
        kv = self.inner.kv_cache_spec()
        self.L = kv[2]  # trailing KV layers the draft occupies
        self._kv_spec = kv
        # shared-with-target head? (all known MTP checkpoints carry
        # their own shared_head for deepseek/glm; ernie/qwen3-next
        # share the target's lm_head — both paths work because the
        # remapped key resolves inside the same checkpoint)
        self.hidden = target_cfg.hidden_size

    # ------------------------------------------------------------------

    def param_specs(self) -> list[ParamSpec]:
        km = self.keymap
        TL = self.target_layers_hf
        H = self.hidden

        def key(template: str) -> str:
            return template.replace("{TL}", str(TL))

        specs = [
            ParamSpec("mtp_enorm", (H, ), P(), key(km["enorm"]),
                      transform=None),
            ParamSpec("mtp_hnorm", (H, ), P(), key(km["hnorm"]),
                      transform=None),
            ParamSpec("mtp_eh_proj", (2 * H, H), P(None, None),
                      key(km["proj"]), transform=transpose2d),
        ]
        off = TL if km["layer_offset"] == "TL" else km["layer_offset"]
        for s in self.inner.param_specs():
            s = copy.copy(s)
            if s.path == "embed_tokens":
                continue  # MTP shares the target's embedding
            if s.path == "final_norm":
                s.hf_key = key(km["final_norm"])
            elif s.path == "lm_head":
                s.hf_key = key(km["lm_head"])
            elif s.stacked:
                if km["layer_prefix"] is not None:
                    old, new = km["layer_prefix"]
                    s.hf_key = s.hf_key.replace(old, new)
                s.layer_offset = getattr(s, "layer_offset", 0) + off
            specs.append(s)
        return specs

    def kv_cache_spec(self) -> tuple[int, int, int]:
        return self._kv_spec

    # ------------------------------------------------------------------

    def embed(self, params: dict, target_params: dict,
              input_ids: jax.Array) -> jax.Array:
        return jnp.take(target_params["embed_tokens"], input_ids,
                        axis=0)

    def __call__(
        self,
        params: dict,  # the draft subtree
        target_params: dict,
        input_ids: jax.Array,  # [T] next-token ids (shifted)
        hidden: jax.Array,  # [T, H] target hidden at same positions
        positions: jax.Array,  # [T]
        kv_caches: jax.Array,  # FULL stacked cache
        attn_meta: AttentionMetadata,
        layer_offset: int,  # draft layers live at L_target + l
        use_pallas: Optional[bool] = None,
    ) -> tuple[jax.Array, jax.Array]:
        emb = self.embed(params, target_params, input_ids)
        # position-0 embeddings are masked (reference:
        # deepseek_mtp.py forward "masking inputs at position 0")
        emb = jnp.where((positions == 0)[:, None],
                        jnp.zeros_like(emb), emb)
        e = rms_norm(emb, params["mtp_enorm"], self.eps)
        h = rms_norm(hidden.astype(emb.dtype), params["mtp_hnorm"],
                     self.eps)
        x = jnp.concatenate([e, h], axis=-1) @ \
            params["mtp_eh_proj"].astype(emb.dtype)
        kv_d = jax.lax.slice_in_dim(kv_caches, layer_offset,
                                    layer_offset + self.L, axis=0)
        out, kv_d = self.inner(params, input_ids, positions, kv_d,
                               attn_meta, use_pallas=use_pallas,
                               inputs_embeds=x)
        kv_caches = jax.lax.dynamic_update_slice_in_dim(
            kv_caches, kv_d, layer_offset, axis=0)
        return out, kv_caches

    def compute_logits(self, params: dict, target_params: dict,
                       target_model, hidden: jax.Array) -> jax.Array:
        if "lm_head" in params:
            return self.inner.compute_logits(params, hidden)
        # head shared with the target (tied-embedding checkpoints)
        return target_model.compute_logits(target_params, hidden)

    def propose_token(self, params: dict, target_params: dict,
                      target_model, hidden: jax.Array) -> jax.Array:
        return jnp.argmax(
            self.compute_logits(params, target_params, target_model,
                                hidden), axis=-1).astype(jnp.int32)


def make_mtp_config(target_cfg: ModelConfig) -> ModelConfig:
    """The MTP weights live inside the target checkpoint; the draft
    config is the target's own directory."""
    return copy.copy(target_cfg)
