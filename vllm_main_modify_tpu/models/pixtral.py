"""Pixtral-12B, both checkpoint formats.

Reference: vllm/model_executor/models/pixtral.py —
``PixtralHFVisionModel`` (HF-format repos: LlavaForConditionalGeneration
with ``vision_config.model_type == "pixtral"``) and
``PixtralForConditionalGeneration`` (mistral-format repos:
``params.json`` + ``consolidated.safetensors``).

The tower is the same Llama-flavored 2-D-rope ViT the Mistral-3 family
uses (models/mistral3.py) minus the patch merger; the projector is the
LLaVA 2-layer MLP (mistral name: ``vision_language_adapter.w_in/w_out``).
Pixtral's prompt layout weaves an ``[IMG_BREAK]`` token after each
patch row and ends with ``[IMG_END]`` (reference pixtral.py:295-301);
here the break/end rows are emitted by ``encode_images`` as those
tokens' embeddings so the runner's contiguous feature scatter is
preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.interface import ParamSpec
from vllm_main_modify_tpu.models.mistral3 import \
    Mistral3ForConditionalGeneration


def pixtral_break_end(hf) -> tuple:
    return (getattr(hf, "image_break_token_id", None),
            getattr(hf, "image_end_token_id", None))


class PixtralHFForConditionalGeneration(
        Mistral3ForConditionalGeneration):

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # no patch merger in the Pixtral projector; LLaVA biases
        hf.spatial_merge_size = 1
        if not hasattr(hf, "multimodal_projector_bias"):
            hf.multimodal_projector_bias = True
        fl = getattr(hf, "vision_feature_layer", -1)
        if fl not in (-1, None):
            raise NotImplementedError(
                "pixtral tower supports vision_feature_layer=-1 only")
        strategy = getattr(hf, "vision_feature_select_strategy",
                           "full")
        if strategy != "full":
            raise NotImplementedError(
                "pixtral has no CLS token; only the 'full' feature "
                "select strategy is meaningful")
        super().__init__(config)
        self.image_break_token_id, self.image_end_token_id = \
            pixtral_break_end(hf)
        if self.image_break_token_id is not None:
            # grid rows x (grid patches + break), last break -> end
            self.num_image_tokens = self.grid * (self.grid + 1)

    def param_specs(self) -> list[ParamSpec]:
        # the Pixtral projector has no merger norm / merging layer
        return [s for s in super().param_specs()
                if s.path not in ("merger.norm", "merger.merging")]

    def encode_images(self, params, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] → [N, g*(g+1), H] with break/end embeddings
        woven in ([N, g*g, H] when the config has no break token)."""
        x = self._tower(params, pixel_values)  # [N, P, D]
        mg = params["merger"]
        x = x @ mg["linear_1"]
        if "linear_1_bias" in mg:
            x = x + mg["linear_1_bias"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ mg["linear_2"]
        if "linear_2_bias" in mg:
            x = x + mg["linear_2_bias"]
        if self.image_break_token_id is None:
            return x
        n, _, h = x.shape
        g = self.grid
        emb = params["language_model"]["embed_tokens"]
        brk = emb[self.image_break_token_id].astype(x.dtype)
        end = emb[self.image_end_token_id].astype(x.dtype)
        x = x.reshape(n, g, g, h)
        col = jnp.broadcast_to(brk[None, None, None, :], (n, g, 1, h))
        x = jnp.concatenate([x, col], axis=2).reshape(n, g * (g + 1),
                                                      h)
        return x.at[:, -1, :].set(end[None])


# mistral-format consolidated.safetensors key layout (reference:
# pixtral.py PixtralForConditionalGeneration + mistral-common naming)
_VISION_RENAMES = [
    ("vision_tower.", "vision_encoder."),
    (".attention.q_proj.", ".attention.wq."),
    (".attention.k_proj.", ".attention.wk."),
    (".attention.v_proj.", ".attention.wv."),
    (".attention.o_proj.", ".attention.wo."),
    (".feed_forward.gate_proj.", ".feed_forward.w1."),
    (".feed_forward.down_proj.", ".feed_forward.w2."),
    (".feed_forward.up_proj.", ".feed_forward.w3."),
    ("multi_modal_projector.linear_1", "vision_language_adapter.w_in"),
    ("multi_modal_projector.linear_2",
     "vision_language_adapter.w_out"),
]
_TEXT_RENAMES = [
    ("language_model.model.embed_tokens.weight",
     "tok_embeddings.weight"),
    ("language_model.model.norm.weight", "norm.weight"),
    ("language_model.lm_head.weight", "output.weight"),
    ("language_model.model.layers.", "layers."),
    (".self_attn.q_proj.", ".attention.wq."),
    (".self_attn.k_proj.", ".attention.wk."),
    (".self_attn.v_proj.", ".attention.wv."),
    (".self_attn.o_proj.", ".attention.wo."),
    (".mlp.gate_proj.", ".feed_forward.w1."),
    (".mlp.down_proj.", ".feed_forward.w2."),
    (".mlp.up_proj.", ".feed_forward.w3."),
    (".input_layernorm.", ".attention_norm."),
    (".post_attention_layernorm.", ".ffn_norm."),
]


def _mistral_key(key: str) -> str:
    for old, new in _VISION_RENAMES + _TEXT_RENAMES:
        key = key.replace(old, new)
    return key


class PixtralForConditionalGeneration(PixtralHFForConditionalGeneration):
    """mistral-format repos (mistralai/Pixtral-12B-2409): the same
    graph with consolidated.safetensors key names; the config is
    synthesized from params.json (config.load_mistral_params_json)."""

    def param_specs(self) -> list[ParamSpec]:
        specs = super().param_specs()
        for s in specs:
            s.hf_key = _mistral_key(s.hf_key)
        return specs
