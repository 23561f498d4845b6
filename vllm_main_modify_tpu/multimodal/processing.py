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


QWEN_VL_ARCHS = ("Qwen2VLForConditionalGeneration",
                 "Qwen2_5_VLForConditionalGeneration",
                 "Qwen3VLForConditionalGeneration",
                 "Qwen3VLMoeForConditionalGeneration",
                 # GLM-4.1V/4.5V share the Qwen2-VL mm-rope ingest
                 # (fixed-res grid + 3-D positions); only the in-model
                 # rotation convention differs (models/glm4v.py)
                 "Glm4vForConditionalGeneration",
                 "Glm4vMoeForConditionalGeneration",
                 # Omni thinker: Qwen2.5-VL vision/mrope ingest
                 "Qwen2_5OmniThinkerForConditionalGeneration",
                 "Qwen2_5OmniModel",
                 "Qwen2_5OmniForConditionalGeneration")


def _is_qwen_vl(model_config) -> bool:
    return model_config.architecture in QWEN_VL_ARCHS


def _qwen_vl_dims(model_config) -> tuple[int, int, int]:
    """(canonical size px, patch grid, merge) for the fixed-resolution
    Qwen-VL path."""
    vc = model_config.hf_config.vision_config
    # Qwen-VL vision configs are native-dynamic-res (no image_size);
    # GLM-4V carries the learned-pos-embedding grid's image_size.
    size = int(model_config.mm_image_size
               or getattr(vc, "image_size", None) or 448)
    return size, size // vc.patch_size, getattr(
        vc, "spatial_merge_size", 2)


def _get(cfg, key, default=None):
    """Attr-or-dict sub-config field access (remote-code configs
    arrive as plain dicts)."""
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def num_image_tokens_for(model_config) -> int:
    """Tokens one image expands to (CLIP-ViT grid, minus CLS for the
    'default' select strategy; Qwen-VL: merged canonical grid)."""
    hf = model_config.hf_config
    if model_config.architecture == "FuyuForCausalLM":
        # no vision tower: raw patches at the canonical resolution
        size = int(model_config.mm_image_size or 224)
        return (size // int(getattr(hf, "patch_size", 30)))**2
    if model_config.architecture == "Phi3VForCausalLM":
        # HD transform at the fixed 1x1 crop grid: sub block with a
        # newline per merged row + glb_GN separator + global block
        # (models/phi3v.py)
        from vllm_main_modify_tpu.models.phi3v import \
            phi3v_vision_dims

        d = phi3v_vision_dims(hf)
        m = d["image_size"] // d["patch_size"] // 2
        return 2 * m * (m + 1) + 1
    if model_config.architecture == \
            "Ovis2ForConditionalGeneration":
        vc2 = hf.vision_config
        hs = int(getattr(vc2, "hidden_stride", 1))
        return (vc2.image_size // vc2.patch_size // hs)**2
    if model_config.architecture == \
            "Emu3ForConditionalGeneration":
        # VQ latent grid + one EOL per row (reference: emu3.py
        # convert_img2bpe appends an EOL column)
        vq = hf.vq_config
        get = (vq.get if isinstance(vq, dict)
               else lambda k, d=None: getattr(vq, k, d))
        size = int(model_config.mm_image_size or 512)
        g = size // (2**(len(get("channel_multiplier")) - 1))
        return g * (g + 1)
    if model_config.architecture == \
            "ChameleonForConditionalGeneration":
        # discrete VQ tokens at the latent grid (reference:
        # chameleon.py get_num_image_tokens)
        vq = hf.vq_config
        get = (vq.get if isinstance(vq, dict)
               else lambda k, d=None: getattr(vq, k, d))
        g = int(get("resolution")) // \
            (2**(len(get("channel_multiplier")) - 1))
        return g * g
    if model_config.architecture == \
            "AriaForConditionalGeneration":
        # learned-query projector: tokens = patch_to_query_dict at the
        # canonical patch count (reference: aria.py AriaProjector)
        g = (hf.vision_config.image_size //
             hf.vision_config.patch_size)**2
        return int({int(k): int(v) for k, v in dict(
            hf.projector_patch_to_query_dict).items()}[g])
    if model_config.architecture == \
            "Blip2ForConditionalGeneration":
        # each image -> num_query_tokens Q-Former soft tokens
        # (reference: blip2.py)
        return int(hf.num_query_tokens)
    if model_config.architecture in ("QwenVLForConditionalGeneration",
                                     "QWenLMHeadModel") and \
            getattr(hf, "visual", None):
        # Resampler2 pool: n_queries learned queries per image
        return int(dict(hf.visual).get("n_queries", 256))
    vc = getattr(hf, "vision_config", None)
    if vc is None:
        raise ValueError(f"{model_config.architecture} has no "
                         "vision_config")
    if _is_qwen_vl(model_config):
        _, grid, merge = _qwen_vl_dims(model_config)
        return (grid // merge)**2
    if model_config.architecture in (
            "Idefics3ForConditionalGeneration",
            "SmolVLMForConditionalGeneration"):
        sf = getattr(hf, "scale_factor", 2)
        return (vc.image_size // vc.patch_size // sf)**2
    if model_config.architecture == \
            "Mistral3ForConditionalGeneration":
        size = int(model_config.mm_image_size or vc.image_size)
        sm = getattr(hf, "spatial_merge_size", 2)
        return (size // vc.patch_size // sm)**2
    if getattr(vc, "model_type", "") == "pixtral":
        # HF-format Pixtral under the Llava arch name, or the
        # mistral-format PixtralForConditionalGeneration: one token
        # per patch + [IMG_BREAK] per row (last row [IMG_END])
        size = int(model_config.mm_image_size or vc.image_size)
        g = size // vc.patch_size
        if getattr(hf, "image_break_token_id", None) is not None:
            return g * (g + 1)
        return g * g
    if model_config.architecture == \
            "Gemma3ForConditionalGeneration":
        # avg-pooled to a fixed soft-token budget (gemma3_mm.py)
        return int(getattr(hf, "mm_tokens_per_image", 256))
    if model_config.architecture in (
            "InternVLForConditionalGeneration",
            "InternS1ForConditionalGeneration",
            "InternVLChatModel", "NVLM_D", "H2OVLChatModel",
            "SkyworkR1VChatModel"):
        ds = int(round(1 / float(getattr(hf, "downsample_ratio",
                                         0.5))))
        img = getattr(hf, "force_image_size", None) or vc.image_size
        img = img[0] if isinstance(img, (list, tuple)) else img
        pt = vc.patch_size
        pt = pt[0] if isinstance(pt, (list, tuple)) else pt
        return (img // pt)**2 // ds**2
    if model_config.architecture == "MiniCPMV":
        # perceiver resampler: query_num learned queries per image
        return int(getattr(hf, "query_num", 64))
    if model_config.architecture == "GLM4VForCausalLM":
        # legacy GLM-4V: boi + (grid/2)^2 + eoi rows
        vc2 = dict(hf.vision_config)
        g2 = int(model_config.mm_image_size
                 or vc2["image_size"]) // int(vc2["patch_size"])
        return 2 + (g2 // 2)**2
    if model_config.architecture in (
            "DotsOCRForCausalLM", "KeyeForConditionalGeneration",
            "KeyeVL1_5ForConditionalGeneration"):
        # Qwen2-VL-style merged grid at the canonical square
        vc2 = hf.vision_config
        size = int(model_config.mm_image_size or 448)
        g = size // int(_get(vc2, "patch_size", 14))
        return (g // int(_get(vc2, "spatial_merge_size", 2)))**2
    if model_config.architecture == "HCXVisionForCausalLM":
        # C-Abstractor pools to a fixed query budget; MLP projectors
        # keep the SigLIP patch grid
        if getattr(hf, "mm_projector_type",
                   "cabstractor") == "cabstractor":
            return int(getattr(hf,
                               "num_queries_vis_abstractor_image",
                               81))
        vch = hf.vision_config
        size = int(model_config.mm_image_size
                   or _get(vch, "image_size", 378))
        return (size // int(_get(vch, "patch_size", 14)))**2
    if model_config.architecture in ("Llama_Nemotron_Nano_VL",
                                     "NemotronH_Nano_VL_V2"):
        # RADIO grid pixel-shuffled by downsample_ratio
        vcn = getattr(hf, "vision_config", None) or {}
        patch = int(_get(vcn, "patch_size", 16))
        pref = _get(vcn, "preferred_resolution", None)
        native = int(pref[0]) if pref else int(
            _get(vcn, "image_size",
                 getattr(hf, "force_image_size", None) or 224))
        size = int(model_config.mm_image_size or native)
        ds = int(round(1 / float(getattr(hf, "downsample_ratio",
                                         0.5))))
        return (size // patch // ds)**2
    if model_config.architecture == "MolmoForCausalLM":
        # 2x2 attention pooling over the crop grid (molmo.py
        # llm_patches_per_crop)
        vcm = getattr(hf, "vision_config", None) or {}
        patch = int(_get(vcm, "image_patch_size", 14))
        default = _get(vcm, "image_default_input_size", (336, 336))
        size = int(model_config.mm_image_size or default[0])
        return ((size // patch + 1) // 2)**2
    if model_config.architecture == \
            "Ernie4_5_VLMoeForConditionalGeneration":
        # resampler compresses the patch grid by spatial_conv_size
        size = int(model_config.mm_image_size or 448)
        g = size // int(_get(hf.vision_config, "patch_size", 14))
        return (g // int(getattr(hf, "spatial_conv_size", 2)))**2
    if model_config.architecture == \
            "Step3VLForConditionalGeneration":
        # two-conv downsampler at the canonical square (no crops):
        # k=2/stride=s then k=3/s=2/p=1 (step3_vl.py
        # _process_image_features)
        vc2 = hf.vision_config
        size = int(model_config.mm_image_size
                   or _get(vc2, "image_size", 728))
        g = size // int(_get(vc2, "patch_size", 14))
        s = int(getattr(hf, "understand_projector_stride", 1))
        g1 = (g - 2) // s + 1
        g2 = (g1 - 1) // 2 + 1
        return g2 * g2
    if model_config.architecture == \
            "KimiVLForConditionalGeneration":
        # MoonViT + 2x2 patch merge at the canonical square
        # (kimi_vl.py get_num_image_tokens at in-limit sizes)
        vc2 = hf.vision_config
        size = int(model_config.mm_image_size or 448)
        g = size // int(_get(vc2, "patch_size", 14))
        mks = _get(vc2, "merge_kernel_size", (2, 2)) or (2, 2)
        return (g // int(mks[0]))**2
    if model_config.architecture == "DeepseekVLV2ForCausalLM":
        # 2D tile formatting at the 1x1-local canonical square:
        # global rows + newline, separator, local rows + newline
        vc2 = hf.vision_config
        pc = hf.projector_config
        g = int(model_config.mm_image_size
                or getattr(vc2, "image_size", 384)) // \
            int(getattr(vc2, "patch_size", 16))
        h = -(-g // int(getattr(pc, "downsample_ratio", 2)))
        return 2 * h * (h + 1) + 1
    if model_config.architecture in ("Phi4MultimodalForCausalLM",
                                     "Phi4MMForCausalLM"):
        # global + sub crop, 2x2 token compression, per-row + global
        # separator extensors (models/phi4_multimodal.py)
        bf = vc.image_size // vc.patch_size // 2
        return 2 * bf * (bf + 1) + 1
    if model_config.architecture == "GotOcr2ForConditionalGeneration":
        # two stride-2 upsampler convs: grid/4 per side
        # (models/got_ocr2.py projector)
        return (vc.image_size // vc.patch_size // 4)**2
    if model_config.architecture in (
            "AyaVisionForConditionalGeneration",
            "Cohere2VisionForConditionalGeneration"):
        f = int(getattr(hf, "downsample_factor", 2))
        return (vc.image_size // vc.patch_size // f)**2
    if model_config.architecture == \
            "Llama4ForConditionalGeneration":
        # pixel shuffle scales the grid by pixel_shuffle_ratio
        # (mllama4.py); one global chunk per image
        r = float(getattr(vc, "pixel_shuffle_ratio", 0.5))
        g = vc.image_size // vc.patch_size
        return int(g * r)**2
    if model_config.architecture in (
            "LlavaOnevisionForConditionalGeneration",
            "RForConditionalGeneration"):
        # base grid + 1x1 tile grid with a newline per row
        g = vc.image_size // vc.patch_size
        return g * g + g * (g + 1)
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


# OpenAI-CLIP normalization (Qwen2-VL image_mean/std defaults)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _resize_chw(image, size: int) -> np.ndarray:
    """Any PIL / HWC-uint8 / CHW-float image → [3, size, size] f32
    in [0, 1]."""
    try:
        from PIL import Image

        if isinstance(image, Image.Image):
            img = image.convert("RGB").resize((size, size),
                                              Image.BICUBIC)
            return np.asarray(img, np.float32).transpose(
                2, 0, 1) / 255.0
    except ImportError:
        pass
    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[-1] == 3:  # HWC
        arr = arr.transpose(2, 0, 1)
    if np.issubdtype(arr.dtype, np.integer):
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    # nearest-neighbor fallback resize
    c, h, w = arr.shape
    if (h, w) != (size, size):
        yi = (np.arange(size) * h // size).clip(0, h - 1)
        xi = (np.arange(size) * w // size).clip(0, w - 1)
        arr = arr[:, yi][:, :, xi]
    return arr


def _mllama_tiles(image, model_config) -> tuple[np.ndarray, int, int]:
    """Mllama tiling (reference: MllamaImageProcessor get_optimal_
    tiled_canvas + split_to_tiles): → ([max_num_tiles, 3, S, S]
    zero-padded tiles, aspect_ratio_id (1-based into
    supported_aspect_ratios), encoder_len = n_tiles * num_patches).

    Pre-tiled float input ([n, 3, S, S]) maps to the FIRST supported
    ratio with that tile count; [3, rh*S, rw*S] float input splits
    directly; anything else is resized to the best-fitting canvas
    (smallest upscale, else largest downscale) and CLIP-normalized.
    """
    hf = model_config.hf_config
    vc = hf.vision_config
    S = vc.image_size
    ratios = [tuple(r) for r in vc.supported_aspect_ratios]
    num_patches = (S // vc.patch_size)**2 + 1
    arr = np.asarray(image) if not hasattr(image, "convert") else None
    if arr is not None and arr.ndim == 4 and arr.shape[1] == 3 and \
            np.issubdtype(arr.dtype, np.floating):
        n = arr.shape[0]
        ratio = next(r for r in ratios if r[0] * r[1] == n)
        tiles = arr.astype(np.float32)
    else:
        if arr is not None and arr.ndim == 3 and arr.shape[0] == 3 \
                and np.issubdtype(arr.dtype, np.floating) and \
                arr.shape[1] % S == 0 and arr.shape[2] % S == 0 and \
                (arr.shape[1] // S, arr.shape[2] // S) in ratios:
            ratio = (arr.shape[1] // S, arr.shape[2] // S)
            canvas = arr.astype(np.float32)
        else:
            # raw image: pick the canvas with the smallest upscale
            # (else the largest downscale), resize, CLIP-normalize
            base = _resize_chw(image, S) if arr is None or \
                arr.ndim != 3 or arr.shape[0] != 3 else (
                    arr.astype(np.float32) / 255.0
                    if np.issubdtype(arr.dtype, np.integer)
                    else arr.astype(np.float32))
            h, w = base.shape[1:]
            scales = [min(r[0] * S / h, r[1] * S / w) for r in ratios]
            up = [(s, r) for s, r in zip(scales, ratios) if s >= 1]
            if up:
                _, ratio = min(up, key=lambda t: t[1][0] * t[1][1])
            else:
                ratio = ratios[int(np.argmax(scales))]
            h2, w2 = ratio[0] * S, ratio[1] * S
            yi = (np.arange(h2) * h // h2).clip(0, h - 1)
            xi = (np.arange(w2) * w // w2).clip(0, w - 1)
            canvas = base[:, yi][:, :, xi]
            canvas = ((canvas - _CLIP_MEAN[:, None, None]) /
                      _CLIP_STD[:, None, None]).astype(np.float32)
        rh, rw = ratio
        tiles = canvas.reshape(3, rh, S, rw, S).transpose(
            1, 3, 0, 2, 4).reshape(rh * rw, 3, S, S)
    n = tiles.shape[0]
    mt = vc.max_num_tiles
    if n < mt:
        tiles = np.concatenate(
            [tiles, np.zeros((mt - n, 3, S, S), np.float32)])
    return tiles, ratios.index(tuple(ratio)) + 1, n * num_patches


def _to_pixel_values(image, model_config) -> np.ndarray:
    """→ [3, S, S] f32, normalized."""
    if _is_qwen_vl(model_config):
        size, _, _ = _qwen_vl_dims(model_config)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, size, size) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)  # already normalized
        arr = _resize_chw(image, size)
        return ((arr - _CLIP_MEAN[:, None, None]) /
                _CLIP_STD[:, None, None]).astype(np.float32)
    if model_config.architecture == "FuyuForCausalLM":
        vs = int(model_config.mm_image_size or 224)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        # Fuyu normalization: (x/255 - 0.5) / 0.5
        arr = _resize_chw(image, vs)
        return ((arr - 0.5) / 0.5).astype(np.float32)
    if model_config.architecture == "Phi3VForCausalLM":
        from vllm_main_modify_tpu.models.phi3v import \
            phi3v_vision_dims

        vs = phi3v_vision_dims(model_config.hf_config)["image_size"]
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)  # CLIP normalization (HF phi3v)
        return ((arr - _CLIP_MEAN[:, None, None]) /
                _CLIP_STD[:, None, None]).astype(np.float32)
    if model_config.architecture == \
            "Emu3ForConditionalGeneration":
        vs = int(model_config.mm_image_size or 512)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)
        return ((arr - 0.5) / 0.5).astype(np.float32)
    if model_config.architecture == \
            "ChameleonForConditionalGeneration":
        # VQ-GAN canonical resolution; HF normalization is
        # (x/255 - 1.0...) handled by its processor — preprocessed
        # float arrays pass through
        vq = model_config.hf_config.vq_config
        vs = int(vq.get("resolution") if isinstance(vq, dict)
                 else vq.resolution)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)  # HF chameleon: (x - .5) / .5
        return ((arr - 0.5) / 0.5).astype(np.float32)
    if model_config.architecture in (
            "QwenVLForConditionalGeneration", "QWenLMHeadModel") and \
            getattr(model_config.hf_config, "visual", None):
        v = dict(model_config.hf_config.visual)
        vs = int(model_config.mm_image_size or v["image_size"])
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)  # OpenCLIP normalization
        return ((arr - _CLIP_MEAN[:, None, None]) /
                _CLIP_STD[:, None, None]).astype(np.float32)
    if model_config.architecture == \
            "Step3VLForConditionalGeneration":
        # CLIP normalization (Step3VisionProcessor, step3_vl.py:64-80)
        vc3 = model_config.hf_config.vision_config
        vs = int(model_config.mm_image_size
                 or _get(vc3, "image_size", 728))
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)
        return ((arr - _CLIP_MEAN[:, None, None]) /
                _CLIP_STD[:, None, None]).astype(np.float32)
    if model_config.architecture in ("Llama_Nemotron_Nano_VL",
                                     "NemotronH_Nano_VL_V2"):
        # RADIO InputConditioner: (x - norm_mean) / norm_std
        # (radio.py:47-68; defaults are the CLIP stats)
        hfn = model_config.hf_config
        vcn = getattr(hfn, "vision_config", None) or {}
        pref = _get(vcn, "preferred_resolution", None)
        native = int(pref[0]) if pref else int(
            _get(vcn, "image_size",
                 getattr(hfn, "force_image_size", None) or 224))
        vs = int(model_config.mm_image_size or native)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        mean = np.asarray(
            getattr(hfn, "norm_mean", None) or _CLIP_MEAN,
            np.float32)
        std = np.asarray(
            getattr(hfn, "norm_std", None) or _CLIP_STD, np.float32)
        arr = _resize_chw(image, vs)
        return ((arr - mean[:, None, None]) /
                std[:, None, None]).astype(np.float32)
    if model_config.architecture == "MolmoForCausalLM":
        # CLIP ViT-L normalization at the canonical crop size
        vcm = getattr(model_config.hf_config, "vision_config",
                      None) or {}
        default = _get(vcm, "image_default_input_size", (336, 336))
        vs = int(model_config.mm_image_size or default[0])
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)
        return ((arr - _CLIP_MEAN[:, None, None]) /
                _CLIP_STD[:, None, None]).astype(np.float32)
    if model_config.architecture in (
            "KeyeForConditionalGeneration",
            "KeyeVL1_5ForConditionalGeneration",
            "HCXVisionForCausalLM"):
        # SigLIP normalization ((x - .5) / .5), canonical square
        vch = getattr(model_config.hf_config, "vision_config", None)
        vs = int(model_config.mm_image_size
                 or _get(vch or {}, "image_size", None) or 448)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)
        return ((arr - 0.5) / 0.5).astype(np.float32)
    if model_config.architecture in (
            "DotsOCRForCausalLM",
            "Ernie4_5_VLMoeForConditionalGeneration"):
        # Qwen2-VL-style image processor (CLIP normalization),
        # dynamic-res vision config without image_size → canonical
        # square
        vs = int(model_config.mm_image_size or 448)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)
        return ((arr - _CLIP_MEAN[:, None, None]) /
                _CLIP_STD[:, None, None]).astype(np.float32)
    if model_config.architecture == \
            "KimiVLForConditionalGeneration":
        # MoonViT is native-dynamic-res (no image_size); canonical
        # square, CLIP-style normalization (Kimi image processor)
        vs = int(model_config.mm_image_size or 448)
        if isinstance(image, np.ndarray) and image.ndim == 3 and \
                image.shape == (3, vs, vs) and \
                np.issubdtype(image.dtype, np.floating):
            return image.astype(np.float32)
        arr = _resize_chw(image, vs)
        return ((arr - _CLIP_MEAN[:, None, None]) /
                _CLIP_STD[:, None, None]).astype(np.float32)
    vc = model_config.hf_config.vision_config
    if isinstance(vc, dict):  # remote-code dict sub-config (MiniCPMV)
        from types import SimpleNamespace
        vc = SimpleNamespace(**vc)
    vs = model_config.mm_image_size or getattr(
        model_config.hf_config, "force_image_size",
        None) or vc.image_size  # remote-code InternVL / pixtral
    vs = vs[0] if isinstance(vs, (list, tuple)) else vs  # InternVL
    if isinstance(image, np.ndarray) and image.ndim == 3 and \
            image.shape == (3, vs, vs) and \
            np.issubdtype(image.dtype, np.floating):
        return image.astype(np.float32)  # already preprocessed CHW
    proc = _image_processor(model_config.model)
    if proc is None:
        raise ValueError(
            "image is not a preprocessed [3, S, S] float array and "
            "no HF image processor ships with the model")
    out = proc(images=image, return_tensors="np")
    return out["pixel_values"][0].astype(np.float32)


def _llava_next_prepare(image, model_config
                        ) -> tuple[np.ndarray, int]:
    """LLaVA-NeXT anyres at fixed per-pinpoint shapes: squash-resize
    to the best grid pinpoint (unpad becomes identity), tile
    row-major, prepend the base-resolution image. Returns
    ([1+T, 3, S, S], num_tokens)."""
    from vllm_main_modify_tpu.models.llava import \
        select_best_resolution

    hf = model_config.hf_config
    vc = hf.vision_config
    s = vc.image_size
    pinpoints = [tuple(p) for p in hf.image_grid_pinpoints]

    arr = np.asarray(image) if not hasattr(image, "convert") else None
    if arr is not None and arr.ndim == 3 and arr.shape[0] == 3 and \
            np.issubdtype(arr.dtype, np.floating):
        orig_h, orig_w = arr.shape[1], arr.shape[2]
        chw = arr.astype(np.float32)  # already normalized
    else:
        # raw image: normalize CLIP-style at native size first
        if hasattr(image, "convert"):
            import numpy as _np
            img = image.convert("RGB")
            chw = _np.asarray(img, _np.float32).transpose(
                2, 0, 1) / 255.0
        else:
            chw = np.asarray(image, np.float32)
            if chw.ndim == 3 and chw.shape[-1] == 3:
                chw = chw.transpose(2, 0, 1)
            if chw.max() > 2.0:
                chw = chw / 255.0
        chw = ((chw - _CLIP_MEAN[:, None, None]) /
               _CLIP_STD[:, None, None])
        orig_h, orig_w = chw.shape[1], chw.shape[2]

    def resize(a, h, w):
        yi = (np.arange(h) * a.shape[1] // h).clip(0, a.shape[1] - 1)
        xi = (np.arange(w) * a.shape[2] // w).clip(0, a.shape[2] - 1)
        return a[:, yi][:, :, xi]

    bh, bw = select_best_resolution((orig_h, orig_w), pinpoints)
    hires = resize(chw, bh, bw)
    tiles = [hires[:, i:i + s, j:j + s]
             for i in range(0, bh, s) for j in range(0, bw, s)]
    base = resize(chw, s, s)
    pix = np.stack([base] + tiles).astype(np.float32)
    grid = s // vc.patch_size
    half = getattr(hf, "vision_feature_select_strategy",
                   "default") == "default"
    base_tokens = grid * grid + (0 if half else 1)
    n_tok = base_tokens + (bh // s) * grid * ((bw // s) * grid + 1)
    return pix, n_tok


def _video_frames(video, model_config) -> np.ndarray:
    """Any [F, 3, H, W] / [F, H, W, 3] frame stack (or list of
    frames) → [F, 3, S, S] f32 normalized."""
    if isinstance(video, np.ndarray) and video.ndim == 4:
        frames = list(video)
    else:
        frames = list(video)
    return np.stack([_to_pixel_values(f, model_config)
                     for f in frames]).astype(np.float32)


def build_mm_inputs(
    token_ids: list[int],
    images: Any,
    model_config,
    videos: Any = None,
) -> tuple[list[int], list[dict], str]:
    """Expand each image placeholder in ``token_ids`` to the model's
    per-image token count and preprocess pixels.

    Returns (expanded_token_ids, mm_inputs, content_salt)."""
    if images is None:
        images = []
    if not isinstance(images, (list, tuple)):
        images = [images]
    image_token = model_config.image_token_index
    n_tok = num_image_tokens_for(model_config)

    video_token = getattr(model_config.hf_config, "video_token_index",
                          None)
    if videos is not None and not isinstance(videos, (list, tuple)):
        videos = [videos]
    videos = list(videos or [])
    if videos and video_token is None:
        raise ValueError("video given but the model has no "
                         "video_token_index")

    placeholders = [i for i, t in enumerate(token_ids)
                    if t == image_token]
    if len(placeholders) != len(images):
        raise ValueError(
            f"prompt has {len(placeholders)} image placeholder(s) "
            f"but {len(images)} image(s) were provided")
    if video_token is not None:
        vph = [i for i, t in enumerate(token_ids) if t == video_token]
        if len(vph) != len(videos):
            raise ValueError(
                f"prompt has {len(vph)} video placeholder(s) but "
                f"{len(videos)} video(s) were provided")

    is_llava_next = model_config.architecture in (
        "LlavaNextForConditionalGeneration",
        "LlavaNextVideoForConditionalGeneration",
        # MiniMax-VL-01 rides the same anyres recipe
        "MiniMaxVL01ForConditionalGeneration")
    is_onevision = model_config.architecture in (
        "LlavaOnevisionForConditionalGeneration",
        # RVL rides the onevision recipe (models/llava_onevision.py)
        "RForConditionalGeneration")
    # Phi-3V: global image + one 1x1 HD crop (identical at the
    # canonical square resolution), stacked [2, 3, S, S]
    is_phi3v = model_config.architecture in (
        "Phi3VForCausalLM", "Phi4MultimodalForCausalLM",
        "Phi4MMForCausalLM",
        # DeepSeek-VL2: global + identical 1x1 local tile
        "DeepseekVLV2ForCausalLM")
    expanded: list[int] = []
    mm_inputs: list[dict] = []
    salt = hashlib.sha256()
    img_iter = iter(images)
    vid_iter = iter(videos)
    for i, tok in enumerate(token_ids):
        if video_token is not None and tok == video_token:
            # per-frame pooled tokens (llava_next_video.py: frames *
            # (grid // spatial_pool_stride)**2)
            pixels = _video_frames(next(vid_iter), model_config)
            hf = model_config.hf_config
            vc = hf.vision_config
            g = vc.image_size // vc.patch_size
            stride = getattr(hf, "spatial_pool_stride", 2)
            this_tok = len(pixels) * (g // stride)**2
            salt.update(pixels.tobytes())
            mm_inputs.append({
                "pixel_values": pixels,
                "offset": len(expanded),
                "num_tokens": this_tok,
                "is_video": True,
                "hash": hashlib.sha256(
                    pixels.tobytes() + bytes(str(pixels.shape),
                                             "ascii")).hexdigest()[:24],
            })
            expanded.extend([video_token] * this_tok)
            continue
        if tok != image_token:
            expanded.append(tok)
            continue
        if model_config.architecture == \
                "MllamaForConditionalGeneration":
            # cross-attention VLM (Llama 3.2 Vision): the <|image|>
            # token stays ONE real token in the decoder stream; the
            # tiled pixels run the vision tower at ingest and land in
            # the cross-KV pool (models/mllama.py; reference:
            # vllm/model_executor/models/mllama.py encoder-decoder
            # treatment)
            tiles, ar_id, enc_len = _mllama_tiles(
                next(img_iter), model_config)
            salt.update(tiles.tobytes())
            mm_inputs.append({
                "pixel_values_tiles": tiles,
                "aspect_ratio_id": ar_id,
                "enc_len": enc_len,
                "hash": hashlib.sha256(
                    tiles.tobytes() +
                    bytes(str(ar_id), "ascii")).hexdigest()[:24],
            })
            expanded.append(tok)
            continue
        if model_config.architecture in (
                "ChameleonForConditionalGeneration",
                "Emu3ForConditionalGeneration"):
            # early fusion: the image becomes REAL codebook tokens in
            # the stream (host-side VQ encode); no soft embeddings
            from vllm_main_modify_tpu.multimodal.chameleon_vq import \
                image_tokenizer

            pixels = _to_pixel_values(next(img_iter), model_config)
            ids = image_tokenizer(model_config).encode(pixels)
            assert len(ids) == n_tok, (len(ids), n_tok)
            salt.update(np.asarray(ids, np.int32).tobytes())
            expanded.extend(ids)
            continue
        if is_llava_next:
            pixels, this_tok = _llava_next_prepare(
                next(img_iter), model_config)
        elif is_onevision or is_phi3v:
            # base + one tile (identical at the canonical square
            # resolution) — HF anyres at pinpoint == base size
            pv = _to_pixel_values(next(img_iter), model_config)
            pixels = np.stack([pv, pv])
            this_tok = n_tok
        else:
            pixels = _to_pixel_values(next(img_iter), model_config)
            this_tok = n_tok
        salt.update(pixels.tobytes())
        mm_inputs.append({
            "pixel_values": pixels,
            "offset": len(expanded),
            "num_tokens": this_tok,
            # content key for cross-request encoder-output reuse
            # (reference: encoder_cache_manager.py keyed by mm hash)
            "hash": hashlib.sha256(
                pixels.tobytes() + bytes(str(pixels.shape),
                                         "ascii")).hexdigest()[:24],
        })
        expanded.extend([image_token] * this_tok)
    is_keye = model_config.architecture in (
        "KeyeForConditionalGeneration",
        "KeyeVL1_5ForConditionalGeneration")
    is_ernie_vl = model_config.architecture == \
        "Ernie4_5_VLMoeForConditionalGeneration"
    if mm_inputs and (_is_qwen_vl(model_config) or is_keye
                      or is_ernie_vl):
        # mrope 3-D positions for the whole prompt + decode delta
        # (reference: MRotaryEmbedding.get_input_positions; Keye rides
        # the same recipe, keye.py:1509)
        from vllm_main_modify_tpu.models.qwen2_vl import \
            compute_mrope_positions

        if is_keye:
            vck = model_config.hf_config.vision_config
            grid = int(model_config.mm_image_size or 448) // \
                int(_get(vck, "patch_size", 14))
            merge = int(_get(vck, "spatial_merge_size", 2))
        elif is_ernie_vl:
            # ernie positions compress by the RESAMPLER's conv size
            # (mrope.py _ernie_get_input_positions_tensor)
            hfe = model_config.hf_config
            grid = int(model_config.mm_image_size or 448) // \
                int(_get(hfe.vision_config, "patch_size", 14))
            merge = int(getattr(hfe, "spatial_conv_size", 2))
        else:
            _, grid, merge = _qwen_vl_dims(model_config)
        pos3, delta = compute_mrope_positions(
            expanded, image_token, [(1, grid, grid)] * len(mm_inputs),
            merge)
        mm_inputs[0]["mrope_positions"] = pos3
        mm_inputs[0]["mrope_delta"] = delta
    return expanded, mm_inputs, salt.hexdigest()[:16]
