"""Local HF config classes for remote-code model types.

Reference: vllm/transformers_utils/configs/ — checkpoints like
Ultravox, MiniCPM-V and Phi-3V declare a ``model_type`` transformers
doesn't ship a config class for, relying on ``trust_remote_code`` to
download one. No-egress environments (and security-conscious
deployments) can't do that, so — like the reference — we register
lightweight local config classes with ``AutoConfig`` so
``AutoConfig.from_pretrained`` resolves these checkpoints offline.

Only the fields the TPU engine reads are modeled; unknown keys pass
through ``PretrainedConfig`` untouched.
"""

from __future__ import annotations

from typing import Any, Optional

from transformers import CONFIG_MAPPING, AutoConfig, PretrainedConfig


def _sub_config(d: Optional[dict], default_type: str):
    d = dict(d or {})
    model_type = d.pop("model_type", default_type)
    return CONFIG_MAPPING[model_type](**d)


class UltravoxConfig(PretrainedConfig):
    """fixie-ai/ultravox checkpoints (reference:
    vllm/transformers_utils/configs/ultravox.py). Whisper audio tower +
    StackAudioFrames projector + any text backbone."""

    model_type = "ultravox"

    def __init__(
        self,
        audio_config: Optional[dict[str, Any]] = None,
        text_config: Optional[dict[str, Any]] = None,
        audio_model_id: Optional[str] = None,
        text_model_id: Optional[str] = None,
        ignore_index: int = -100,
        audio_token_index: int = 32000,
        hidden_size: int = 4096,
        stack_factor: int = 8,
        norm_init: float = 0.4,
        projector_act: str = "swiglu",
        projector_ln_mid: bool = False,
        **kwargs,
    ):
        self.ignore_index = ignore_index
        self.audio_token_index = audio_token_index
        self.hidden_size = hidden_size
        self.stack_factor = stack_factor
        self.norm_init = norm_init
        self.projector_act = projector_act
        self.projector_ln_mid = projector_ln_mid
        # offline build: the wrapped configs must be inline dicts
        # (model-id indirection would need network egress)
        self.audio_model_id = None
        self.text_model_id = None
        self.audio_config = _sub_config(audio_config, "whisper")
        self.text_config = _sub_config(text_config, "llama")
        super().__init__(**kwargs)


class Phi3VConfig(PretrainedConfig):
    """microsoft/Phi-3-vision checkpoints (reference:
    vllm/transformers_utils — trust_remote_code there): a Phi-3 text
    config with ``img_processor``/``embd_layer`` vision dicts at the
    top level. ``image_token_index`` must be provided (the official
    convention uses negative placeholder ids rewritten by the chat
    processor; programmatic use passes a real vocab id)."""

    model_type = "phi3_v"

    def __init__(
        self,
        img_processor: Optional[dict[str, Any]] = None,
        embd_layer: Optional[dict[str, Any]] = None,
        image_token_index: Optional[int] = None,
        **kwargs,
    ):
        self.img_processor = img_processor or {}
        self.embd_layer = embd_layer or {}
        if image_token_index is not None:
            self.image_token_index = image_token_index
        # Phi3Config defaults False; the PretrainedConfig base would
        # default True and silently drop lm_head at load
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(**kwargs)


class MiniCPMVConfig(PretrainedConfig):
    """openbmb/MiniCPM-V checkpoints (remote code upstream): a
    Qwen2/Llama text config at the top level plus ``vision_config``
    (idefics2-vision dims), ``query_num`` resampler queries,
    ``version`` (2.6/4.0 routes the decoder family) and
    ``drop_vision_last_layer``. ``image_token_id`` must be provided
    for programmatic use (the official chat template rewrites
    (<image>./</image>) spans instead of using a fixed id)."""

    model_type = "minicpmv"

    def __init__(self, vision_config=None, query_num=64,
                 version="2.6", drop_vision_last_layer=False,
                 image_token_id=None, **kwargs):
        self.vision_config = vision_config or {}
        self.query_num = query_num
        self.version = version
        self.drop_vision_last_layer = drop_vision_last_layer
        if image_token_id is not None:
            self.image_token_id = image_token_id
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(**kwargs)


class MiniMaxVL01Config(PretrainedConfig):
    """MiniMaxAI/MiniMax-VL-01 (remote code upstream): the LLaVA
    composite layout (CLIP vision_config + text_config +
    image_token_index + anyres pinpoints) whose text tree is the
    remote-code MiniMaxText01 hybrid."""

    model_type = "minimax_vl_01"

    def __init__(self, vision_config=None, text_config=None,
                 image_token_index=None, vision_feature_layer=-1,
                 vision_feature_select_strategy="default",
                 image_grid_pinpoints=None, **kwargs):
        from transformers import CLIPVisionConfig
        vd = dict(vision_config or {})
        vd.pop("model_type", None)
        self.vision_config = CLIPVisionConfig(**vd)
        self.text_config = PretrainedConfig(**dict(text_config or {}))
        if image_token_index is not None:
            self.image_token_index = image_token_index
        self.vision_feature_layer = vision_feature_layer
        self.vision_feature_select_strategy = \
            vision_feature_select_strategy
        if image_grid_pinpoints is not None:
            self.image_grid_pinpoints = image_grid_pinpoints
        super().__init__(**kwargs)


class HCXVisionConfig(PretrainedConfig):
    """naver-hyperclovax/HyperCLOVAX-SEED-Vision (remote code
    upstream): SigLIP vision_config + text tree + projector knobs.
    ``image_token_index`` must be provided for programmatic use."""

    model_type = "hyperclovax_vlm"

    def __init__(self, vision_config=None, text_config=None,
                 mm_projector_type="cabstractor",
                 num_queries_vis_abstractor_image=81,
                 proj_pos_emb=True, proj_prenorm=False, anyres=False,
                 unpad=False, image_token_index=None, **kwargs):
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        d = dict(text_config or {})
        lt = d.pop("model_type", "llama")
        self.text_config = CONFIG_MAPPING[lt](**d) \
            if lt in CONFIG_MAPPING else PretrainedConfig(**d)
        self.mm_projector_type = mm_projector_type
        self.num_queries_vis_abstractor_image = \
            num_queries_vis_abstractor_image
        self.proj_pos_emb = proj_pos_emb
        self.proj_prenorm = proj_prenorm
        self.anyres = anyres
        self.unpad = unpad
        if image_token_index is not None:
            self.image_token_index = image_token_index
        super().__init__(**kwargs)


class LlamaNemotronVLConfig(PretrainedConfig):
    """nvidia/Llama-3.1-Nemotron-Nano-VL (remote code upstream):
    InternVL-style composite with a C-RADIO vision_config, projector
    knobs, and the text tree under ``text_config`` (or
    ``llm_config``). ``image_token_index`` must be provided for
    programmatic use."""

    model_type = "Llama_Nemotron_Nano_VL"

    def __init__(self, vision_config=None, text_config=None,
                 llm_config=None, force_image_size=None,
                 downsample_ratio=0.5, ps_version="v2",
                 vit_hidden_size=1280, projector_hidden_size=4096,
                 image_token_index=None, **kwargs):
        self.vision_config = PretrainedConfig(
            **(vision_config or {}))
        d = dict(text_config or llm_config or {})
        lt = d.pop("model_type", "llama")
        self.text_config = CONFIG_MAPPING[lt](**d) \
            if lt in CONFIG_MAPPING else PretrainedConfig(**d)
        self.force_image_size = force_image_size
        self.downsample_ratio = downsample_ratio
        self.ps_version = ps_version
        self.vit_hidden_size = vit_hidden_size
        self.projector_hidden_size = projector_hidden_size
        if image_token_index is not None:
            self.image_token_index = image_token_index
        super().__init__(**kwargs)


class NemotronHNanoVLV2Config(LlamaNemotronVLConfig):
    model_type = "NemotronH_Nano_VL_V2"


class MolmoConfig(PretrainedConfig):
    """allenai/Molmo (remote code upstream): OLMo-style decoder fields
    at the top; the vision backbone is fixed (VisionBackboneConfig
    defaults in the reference, molmo.py:98-119) with optional
    overrides under ``vision_config``. ``image_token_index`` must be
    provided for programmatic use (upstream resolves the patch token
    through its processor)."""

    model_type = "molmo"

    def __init__(self, vision_config=None, image_token_index=None,
                 **kwargs):
        if vision_config is not None:
            self.vision_config = vision_config
        if image_token_index is not None:
            self.image_token_index = image_token_index
        super().__init__(**kwargs)


class Ernie45VLMoeConfig(PretrainedConfig):
    """baidu/ERNIE-4.5-VL (remote code upstream): ERNIE MoE text
    fields at the top + qwen-style vision_config + resampler knobs +
    im_patch_id."""

    model_type = "ernie4_5_moe_vl"

    def __init__(self, vision_config=None, im_patch_id=100295,
                 **kwargs):
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        self.im_patch_id = im_patch_id
        super().__init__(**kwargs)


class KeyeConfig(PretrainedConfig):
    """Kwai-Keye/Keye-VL (remote code upstream): Qwen3 text fields at
    the top level + SigLIP-style vision_config + Qwen2-VL placeholder
    ids."""

    model_type = "keye"

    def __init__(self, vision_config=None, image_token_id=151655,
                 video_token_id=151656, **kwargs):
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        super().__init__(**kwargs)


class KeyeVL1_5Config(KeyeConfig):
    model_type = "keye_vl_1_5"


class DotsOCRConfig(PretrainedConfig):
    """rednote-hilab/dots.ocr (reference shim:
    vllm/transformers_utils/configs/dotsocr.py): a Qwen2 text config
    carrying vision_config + image_token_id at the top level."""

    model_type = "dots_ocr"

    def __init__(self, image_token_id=151665, video_token_id=151656,
                 vision_config=None, **kwargs):
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        super().__init__(**kwargs)


class Step3VLConfig(PretrainedConfig):
    """stepfun-ai/step3 (reference shim:
    vllm/transformers_utils/configs/step3_vl.py): Step3 vision
    encoder config + step3_text config + projector knobs."""

    model_type = "step3_vl"

    def __init__(self, vision_config=None, text_config=None,
                 understand_projector_stride=1, projector_bias=True,
                 image_token_id=128001, **kwargs):
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        d = dict(text_config or {})
        d.pop("model_type", None)
        self.text_config = PretrainedConfig(**d)
        self.understand_projector_stride = understand_projector_stride
        self.projector_bias = projector_bias
        self.image_token_id = image_token_id
        self.hidden_size = getattr(self.text_config, "hidden_size",
                                   7168)
        super().__init__(**kwargs)


class KimiVLConfig(PretrainedConfig):
    """moonshotai/Kimi-VL (remote code upstream; reference shim:
    vllm/transformers_utils/configs/kimi_vl.py): MoonViT
    vision_config + DeepSeek-V2/V3 text_config +
    media_placeholder_token_id."""

    model_type = "kimi_vl"

    def __init__(self, vision_config=None, text_config=None,
                 media_placeholder_token_id=163605, **kwargs):
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        d = dict(text_config or {})
        lt = d.pop("model_type", "deepseek_v2")
        self.text_config = CONFIG_MAPPING[lt](**d)
        self.media_placeholder_token_id = media_placeholder_token_id
        super().__init__(**kwargs)


class DeepseekVLV2Config(PretrainedConfig):
    """deepseek-ai/deepseek-vl2 (remote code upstream): timm-ViT
    vision_config + MLP projector_config + DeepSeek-V2/V3 text tree
    under ``language_config``. ``image_token_index`` must be provided
    for programmatic use (the upstream processor resolves <image>
    through its tokenizer)."""

    model_type = "deepseek_vl_v2"

    def __init__(self, vision_config=None, projector_config=None,
                 language_config=None, tile_tag="2D",
                 global_view_pos="head", candidate_resolutions=None,
                 image_token_index=None, **kwargs):
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        self.projector_config = PretrainedConfig(
            **(projector_config or {}))
        d = dict(language_config or {})
        lt = d.pop("model_type", "deepseek_v2")
        self.language_config = CONFIG_MAPPING[lt](**d)
        self.text_config = self.language_config
        self.tile_tag = tile_tag
        self.global_view_pos = global_view_pos
        self.candidate_resolutions = candidate_resolutions or \
            [[384, 384]]
        if image_token_index is not None:
            self.image_token_index = image_token_index
        super().__init__(**kwargs)


class MiDashengLMConfig(PretrainedConfig):
    """mispeech/midashenglm (remote code upstream): Dasheng audio
    tower config + Qwen2.5 text tree. ``audio_token_id`` must be
    provided for programmatic use (the upstream processor resolves
    <|AUDIO|> through its tokenizer)."""

    model_type = "midashenglm"

    def __init__(self, audio_encoder_config=None, text_config=None,
                 subsample_factor=5, audio_token_id=None, **kwargs):
        self.audio_encoder_config = PretrainedConfig(
            **(audio_encoder_config or {}))
        d = dict(text_config or {})
        lt = d.pop("model_type", "qwen2")
        self.text_config = CONFIG_MAPPING[lt](**d)
        self.subsample_factor = subsample_factor
        if audio_token_id is not None:
            self.audio_token_id = audio_token_id
        super().__init__(**kwargs)


class InternVLChatConfig(PretrainedConfig):
    """Remote-code OpenGVLab InternVL checkpoints (reference:
    vllm/transformers_utils/configs/ — resolved via trust_remote_code
    there; local shim here). The text tree lives under ``llm_config``;
    the InternViT vision config has no transformers class, so it stays
    a plain PretrainedConfig."""

    model_type = "internvl_chat"

    def __init__(
        self,
        vision_config: Optional[dict[str, Any]] = None,
        llm_config: Optional[dict[str, Any]] = None,
        downsample_ratio: float = 0.5,
        select_layer: int = -1,
        ps_version: str = "v2",
        force_image_size: Optional[int] = None,
        image_token_index: Optional[int] = None,
        **kwargs,
    ):
        self.vision_config = PretrainedConfig(**(vision_config or {}))
        d = dict(llm_config or {})
        llm_type = d.pop("model_type", "qwen2")
        self.llm_config = CONFIG_MAPPING[llm_type](**d)
        # expose as text_config too: ModelConfig._derive_from_hf and
        # the composite detection read the standard name
        self.text_config = self.llm_config
        self.downsample_ratio = downsample_ratio
        self.select_layer = select_layer
        self.ps_version = ps_version
        self.force_image_size = force_image_size
        if image_token_index is not None:
            self.image_token_index = image_token_index
        super().__init__(**kwargs)


class NVLMDConfig(InternVLChatConfig):
    model_type = "NVLM_D"


class H2OVLChatConfig(InternVLChatConfig):
    model_type = "h2ovl_chat"


class SkyworkR1VChatConfig(InternVLChatConfig):
    model_type = "skywork_chat"


def load_mistral_params_json(model_dir: str) -> PretrainedConfig:
    """Synthesize an HF-style composite config from a mistral-format
    repo's ``params.json`` (reference: the mistral config adaptation
    in vllm/transformers_utils/). Pixtral repos carry a
    ``vision_encoder`` block; text-only mistral repos map to a plain
    MistralForCausalLM."""
    import json
    import os

    with open(os.path.join(model_dir, "params.json")) as f:
        p = json.load(f)
    text = CONFIG_MAPPING["mistral"](
        vocab_size=p["vocab_size"],
        hidden_size=p["dim"],
        num_hidden_layers=p["n_layers"],
        num_attention_heads=p["n_heads"],
        num_key_value_heads=p.get("n_kv_heads", p["n_heads"]),
        intermediate_size=p["hidden_dim"],
        head_dim=p.get("head_dim"),
        rms_norm_eps=p.get("norm_eps", 1e-5),
        rope_theta=p.get("rope_theta", 1e6),
        max_position_embeddings=p.get("max_seq_len", 131072),
        tie_word_embeddings=False,
        architectures=["MistralForCausalLM"],
    )
    ve = p.get("vision_encoder")
    if ve is None:
        text.architectures = ["MistralForCausalLM"]
        return text
    cfg = PretrainedConfig()
    cfg.architectures = ["PixtralForConditionalGeneration"]
    cfg.model_type = "pixtral"
    cfg.text_config = text
    cfg.vision_config = PretrainedConfig(
        model_type="pixtral",
        hidden_size=ve["hidden_size"],
        intermediate_size=ve["intermediate_size"],
        num_hidden_layers=ve["num_hidden_layers"],
        num_attention_heads=ve["num_attention_heads"],
        image_size=ve["image_size"],
        patch_size=ve["patch_size"],
        rope_theta=ve.get("rope_theta", 1e4),
        head_dim=ve["hidden_size"] // ve["num_attention_heads"],
    )
    # mistral tekken multimodal special tokens: [IMG]=10,
    # [IMG_BREAK]=12, [IMG_END]=13 (reference: pixtral.py processor)
    cfg.image_token_index = ve.get("image_token_id", 10)
    cfg.image_break_token_id = ve.get("image_break_token_id", 12)
    cfg.image_end_token_id = ve.get("image_end_token_id", 13)
    cfg.vision_feature_layer = -1
    cfg.vision_feature_select_strategy = "full"
    return cfg


def _make_jais_config():
    """JAIS repos declare model_type='jais' with remote code
    (reference: vllm/transformers_utils/configs/jais.py). The config
    is GPT-2-shaped (n_embd/n_head/n_layer attribute map) plus muP
    fields read as plain attributes by the model."""
    from transformers import GPT2Config

    class JAISConfig(GPT2Config):
        model_type = "jais"

    return JAISConfig


class BailingMoeConfig(PretrainedConfig):
    """Bailing/Ling MoE remote-code config (reference:
    vllm/transformers_utils/configs — model_type 'bailing_moe'):
    plain attribute passthrough; the model reads the fields directly."""

    model_type = "bailing_moe"


class BailingMoeV2Config(PretrainedConfig):
    model_type = "bailing_moe_v2"


class NemotronNASConfig(PretrainedConfig):
    """DeciLM / Nemotron-NAS remote-code config (reference:
    vllm/transformers_utils/configs/nemotron_nas.py): llama fields
    plus per-layer ``block_configs`` (kept as plain dicts)."""

    model_type = "nemotron-nas"


def register() -> None:
    for cfg_cls in (UltravoxConfig, MiniCPMVConfig,
                    MiniMaxVL01Config, DeepseekVLV2Config,
                    KimiVLConfig, Step3VLConfig, DotsOCRConfig,
                    KeyeConfig, KeyeVL1_5Config, Ernie45VLMoeConfig,
                    MolmoConfig, LlamaNemotronVLConfig,
                    NemotronHNanoVLV2Config, HCXVisionConfig,
                    MiDashengLMConfig,
                    InternVLChatConfig, NVLMDConfig,
                    H2OVLChatConfig, SkyworkR1VChatConfig,
                    Phi3VConfig, NemotronNASConfig,
                    BailingMoeConfig, BailingMoeV2Config,
                    _make_jais_config()):
        if cfg_cls.model_type not in CONFIG_MAPPING:
            AutoConfig.register(cfg_cls.model_type, cfg_cls)
    # RVL (Reka Flash VL) is the llava_onevision composite under its
    # own model_type
    try:
        from transformers import LlavaOnevisionConfig

        class RVLConfig(LlavaOnevisionConfig):
            model_type = "rvl"

        if "rvl" not in CONFIG_MAPPING:
            AutoConfig.register("rvl", RVLConfig)
    except ImportError:
        pass
    # transformers ships the thinker CONFIG class but only maps the
    # full-Omni model_type in AutoConfig; thinker-only exports
    # (model_type qwen2_5_omni_thinker) need the mapping
    try:
        from transformers import Qwen2_5OmniThinkerConfig

        if "qwen2_5_omni_thinker" not in CONFIG_MAPPING:
            AutoConfig.register("qwen2_5_omni_thinker",
                                Qwen2_5OmniThinkerConfig)
    except ImportError:
        pass


register()
