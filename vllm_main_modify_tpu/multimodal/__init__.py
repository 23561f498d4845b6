"""Multimodal input processing (reference: vllm/multimodal/ — the
registry/processor/hasher subsystem, scoped here to image inputs for
the LLaVA family)."""

from vllm_main_modify_tpu.multimodal.processing import (
    build_mm_inputs, num_image_tokens_for)

__all__ = ["build_mm_inputs", "num_image_tokens_for"]
