"""Image input processing: pixel preprocessing, placeholder
expansion, content hashing.

Reference: vllm/multimodal/processing.py + hasher.py — each image's
placeholder token expands to the model's per-image token count, the
image content is hashed into the prefix-cache key (so two prompts
with identical text but different images never share KV blocks), and
pixels are normalized by the checkpoint's HF image processor when one
ships with the model (raw CHW float arrays pass through for
programmatic use).
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional

import numpy as np


def num_image_tokens_for(model_config) -> int:
    """Tokens one image expands to (CLIP-ViT grid, minus CLS for the
    'default' select strategy)."""
    hf = model_config.hf_config
    vc = getattr(hf, "vision_config", None)
    if vc is None:
        raise ValueError(f"{model_config.architecture} has no "
                         "vision_config")
    patches = (vc.image_size // vc.patch_size)**2
    strategy = getattr(hf, "vision_feature_select_strategy",
                       "default")
    return patches + (0 if strategy == "default" else 1)


_HF_PROCESSOR_CACHE: dict[str, Any] = {}


def _image_processor(model_dir: str):
    if model_dir not in _HF_PROCESSOR_CACHE:
        try:
            from transformers import AutoImageProcessor

            _HF_PROCESSOR_CACHE[model_dir] = \
                AutoImageProcessor.from_pretrained(model_dir)
        except Exception:
            _HF_PROCESSOR_CACHE[model_dir] = None
    return _HF_PROCESSOR_CACHE[model_dir]


def _to_pixel_values(image, model_config) -> np.ndarray:
    """→ [3, S, S] f32, normalized."""
    vc = model_config.hf_config.vision_config
    if isinstance(image, np.ndarray) and image.ndim == 3 and \
            image.shape == (3, vc.image_size, vc.image_size) and \
            np.issubdtype(image.dtype, np.floating):
        return image.astype(np.float32)  # already preprocessed CHW
    proc = _image_processor(model_config.model)
    if proc is None:
        raise ValueError(
            "image is not a preprocessed [3, S, S] float array and "
            "no HF image processor ships with the model")
    out = proc(images=image, return_tensors="np")
    return out["pixel_values"][0].astype(np.float32)


def build_mm_inputs(
    token_ids: list[int],
    images: Any,
    model_config,
) -> tuple[list[int], list[dict], str]:
    """Expand each image placeholder in ``token_ids`` to the model's
    per-image token count and preprocess pixels.

    Returns (expanded_token_ids, mm_inputs, content_salt)."""
    if not isinstance(images, (list, tuple)):
        images = [images]
    image_token = model_config.image_token_index
    n_tok = num_image_tokens_for(model_config)

    placeholders = [i for i, t in enumerate(token_ids)
                    if t == image_token]
    if len(placeholders) != len(images):
        raise ValueError(
            f"prompt has {len(placeholders)} image placeholder(s) "
            f"but {len(images)} image(s) were provided")

    expanded: list[int] = []
    mm_inputs: list[dict] = []
    salt = hashlib.sha256()
    img_iter = iter(images)
    for i, tok in enumerate(token_ids):
        if tok != image_token:
            expanded.append(tok)
            continue
        pixels = _to_pixel_values(next(img_iter), model_config)
        salt.update(pixels.tobytes())
        mm_inputs.append({
            "pixel_values": pixels,
            "offset": len(expanded),
            "num_tokens": n_tok,
        })
        expanded.extend([image_token] * n_tok)
    return expanded, mm_inputs, salt.hexdigest()[:16]
