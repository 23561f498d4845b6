"""Emu3 (Emu3ForConditionalGeneration / Emu3ForCausalLM).

Reference: vllm/model_executor/models/emu3.py — Chameleon-style early
fusion: the VQ-GAN (with Emu3's causal temporal conv stack) turns
images into discrete codebook tokens plus a per-row EOL token
(multimodal/chameleon_vq.py Emu3ImageTokenizer, host-side), and the
decoder is a plain llama-family LM over the joint vocabulary.
"""

from __future__ import annotations

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.llama import LlamaForCausalLM


class Emu3ForConditionalGeneration(LlamaForCausalLM):
    """Composite checkpoint: decoder keys under model.text_model."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)

    def param_specs(self):
        specs = super().param_specs()
        for s in specs:
            # HF serializes text_model.model.* / text_model.lm_head.*
            s.hf_key = "text_model." + s.hf_key
        return specs


class Emu3ForCausalLM(LlamaForCausalLM):
    """Text-only export (plain llama key layout)."""
