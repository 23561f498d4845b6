"""Architecture registry (reference: vllm/model_executor/models/
registry.py:555 — 221 architectures with lazy import; this build grows
toward that list family-by-family)."""

from __future__ import annotations

import importlib
from typing import Callable

from vllm_main_modify_tpu.config import ModelConfig

# architecture name (HF config.architectures[0]) -> (module, attr)
_REGISTRY: dict[str, tuple[str, str]] = {
    "LlamaForCausalLM": ("vllm_main_modify_tpu.models.llama",
                         "LlamaForCausalLM"),
    "MistralForCausalLM": ("vllm_main_modify_tpu.models.llama",
                           "LlamaForCausalLM"),
    "Qwen2ForCausalLM": ("vllm_main_modify_tpu.models.registry",
                         "_qwen2_factory"),
    "Qwen3ForCausalLM": ("vllm_main_modify_tpu.models.qwen3",
                         "Qwen3ForCausalLM"),
    "Qwen3MoeForCausalLM": ("vllm_main_modify_tpu.models.qwen3",
                            "Qwen3MoeForCausalLM"),
    "DeepseekForCausalLM": ("vllm_main_modify_tpu.models.moe_llama",
                            "DeepseekForCausalLM"),
    "MixtralForCausalLM": ("vllm_main_modify_tpu.models.moe_llama",
                           "MixtralForCausalLM"),
    "OlmoeForCausalLM": ("vllm_main_modify_tpu.models.moe_llama",
                         "OlmoeForCausalLM"),
    "DbrxForCausalLM": ("vllm_main_modify_tpu.models.moe_misc",
                        "DbrxForCausalLM"),
    "PhiMoEForCausalLM": ("vllm_main_modify_tpu.models.moe_misc",
                          "PhiMoEForCausalLM"),
    "PhimoeForCausalLM": ("vllm_main_modify_tpu.models.moe_misc",
                          "PhiMoEForCausalLM"),
    "GraniteMoeForCausalLM": ("vllm_main_modify_tpu.models.moe_llama",
                              "GraniteMoeForCausalLM"),
    "GraniteMoeSharedForCausalLM": (
        "vllm_main_modify_tpu.models.moe_llama",
        "GraniteMoeSharedForCausalLM"),
    "Qwen2MoeForCausalLM": ("vllm_main_modify_tpu.models.moe_llama",
                            "Qwen2MoeForCausalLM"),
    "DeepseekV2ForCausalLM": ("vllm_main_modify_tpu.models.deepseek_v2",
                              "DeepseekV2ForCausalLM"),
    "DeepseekV3ForCausalLM": ("vllm_main_modify_tpu.models.deepseek_v2",
                              "DeepseekV3ForCausalLM"),
    "Phi3ForCausalLM": ("vllm_main_modify_tpu.models.llama",
                        "Phi3ForCausalLM"),
    "Phi3VForCausalLM": ("vllm_main_modify_tpu.models.phi3v",
                         "Phi3VForCausalLM"),
    "SmolLM3ForCausalLM": ("vllm_main_modify_tpu.models.llama",
                           "SmolLM3ForCausalLM"),
    "Glm4ForCausalLM": ("vllm_main_modify_tpu.models.glm4",
                        "Glm4ForCausalLM"),
    "GlmForCausalLM": ("vllm_main_modify_tpu.models.glm4",
                       "GlmForCausalLM"),
    "GPTJForCausalLM": ("vllm_main_modify_tpu.models"
                        ".gptj_neo_bigcode", "GPTJForCausalLM"),
    "GPTNeoForCausalLM": ("vllm_main_modify_tpu.models"
                          ".gptj_neo_bigcode", "GPTNeoForCausalLM"),
    "GPTBigCodeForCausalLM": ("vllm_main_modify_tpu.models"
                              ".gptj_neo_bigcode",
                              "GPTBigCodeForCausalLM"),
    "PersimmonForCausalLM": ("vllm_main_modify_tpu.models"
                             ".misc_decoders",
                             "PersimmonForCausalLM"),
    "OlmoForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                        "OlmoForCausalLM"),
    "ArceeForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                         "ArceeForCausalLM"),
    "SeedOssForCausalLM": ("vllm_main_modify_tpu.models.registry",
                           "_qwen2_factory"),
    "Ernie4_5ForCausalLM": ("vllm_main_modify_tpu.models"
                            ".misc_decoders", "Ernie4_5ForCausalLM"),
    "InternLMForCausalLM": ("vllm_main_modify_tpu.models.registry",
                            "_use_bias_llama_factory"),
    # exact Llama-graph clones (reference registry.py maps these
    # architecture names straight to llama.py)
    "InternLM2ForCausalLM": (
        "vllm_main_modify_tpu.models.internlm2_baichuan",
        "InternLM2ForCausalLM"),
    # InternLM2-VE's visual-expert FFN only fires on visual tokens
    # (reference: internlm2_ve.py:86 gates on visual_token_mask);
    # text serving is exactly InternLM2 and the ve weights are unused
    "InternLM2VEForCausalLM": (
        "vllm_main_modify_tpu.models.internlm2_baichuan",
        "InternLM2ForCausalLM"),
    "ExaoneForCausalLM": (
        "vllm_main_modify_tpu.models.internlm2_baichuan",
        "ExaoneForCausalLM"),
    # Qwen v1: checkpoints with a `visual` tree are Qwen-VL
    # (reference registry routes the same name through qwen_vl.py)
    "QWenLMHeadModel": ("vllm_main_modify_tpu.models.registry",
                        "_qwen_v1_factory"),
    "QwenVLForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen_vl",
        "QwenVLForConditionalGeneration"),
    "BaiChuanForCausalLM": (  # 7B (rope)
        "vllm_main_modify_tpu.models.internlm2_baichuan",
        "BaiChuanForCausalLM"),
    "BaichuanForCausalLM": (  # 13B (alibi)
        "vllm_main_modify_tpu.models.internlm2_baichuan",
        "BaichuanForCausalLM"),
    "AquilaModel": ("vllm_main_modify_tpu.models.llama",
                    "LlamaForCausalLM"),
    "AquilaForCausalLM": ("vllm_main_modify_tpu.models.llama",
                          "LlamaForCausalLM"),
    "CwmForCausalLM": ("vllm_main_modify_tpu.models.llama",
                       "LlamaForCausalLM"),
    "InternLM3ForCausalLM": ("vllm_main_modify_tpu.models.llama",
                             "LlamaForCausalLM"),
    "LLaMAForCausalLM": ("vllm_main_modify_tpu.models.llama",
                         "LlamaForCausalLM"),
    "XverseForCausalLM": ("vllm_main_modify_tpu.models.llama",
                          "LlamaForCausalLM"),
    "StableLMEpochForCausalLM": ("vllm_main_modify_tpu.models"
                                 ".misc_decoders",
                                 "StableLmForCausalLM"),
    "RWForCausalLM": ("vllm_main_modify_tpu.models.falcon",
                      "FalconForCausalLM"),
    "MantisForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llava",
        "LlavaForConditionalGeneration"),
    "NemotronForCausalLM": ("vllm_main_modify_tpu.models"
                            ".misc_decoders", "NemotronForCausalLM"),
    "GraniteForCausalLM": ("vllm_main_modify_tpu.models.llama",
                           "GraniteForCausalLM"),
    # Motif-2.6B differential-attention decoder (reference:
    # vllm/model_executor/models/motif.py + registry.py:122)
    "MotifForCausalLM": ("vllm_main_modify_tpu.models.motif",
                         "MotifForCausalLM"),
    # PLaMo-2 mamba2/attention hybrid (reference:
    # vllm/model_executor/models/plamo2.py + registry.py:139)
    "Plamo2ForCausalLM": ("vllm_main_modify_tpu.models.plamo2",
                          "Plamo2ForCausalLM"),
    "Starcoder2ForCausalLM": ("vllm_main_modify_tpu.models"
                              ".misc_decoders",
                              "Starcoder2ForCausalLM"),
    "StableLmForCausalLM": ("vllm_main_modify_tpu.models"
                            ".misc_decoders", "StableLmForCausalLM"),
    "PhiForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                       "PhiForCausalLM"),
    "CohereForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                          "CohereForCausalLM"),
    "Cohere2ForCausalLM": ("vllm_main_modify_tpu.models"
                           ".misc_decoders", "Cohere2ForCausalLM"),
    "Exaone4ForCausalLM": ("vllm_main_modify_tpu.models"
                           ".misc_decoders", "Exaone4ForCausalLM"),
    "Olmo2ForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                         "Olmo2ForCausalLM"),
    "Olmo3ForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                         "Olmo3ForCausalLM"),
    "WhisperForConditionalGeneration": (
        "vllm_main_modify_tpu.models.whisper",
        "WhisperForConditionalGeneration"),
    "MllamaForConditionalGeneration": (
        "vllm_main_modify_tpu.models.mllama",
        "MllamaForConditionalGeneration"),
    "Emu3ForConditionalGeneration": ("vllm_main_modify_tpu.models"
                                     ".emu3",
                                     "Emu3ForConditionalGeneration"),
    "Emu3ForCausalLM": ("vllm_main_modify_tpu.models.emu3",
                        "Emu3ForCausalLM"),
    "GraniteSpeechForConditionalGeneration": (
        "vllm_main_modify_tpu.models.granite_speech",
        "GraniteSpeechForConditionalGeneration"),
    "Qwen2_5OmniThinkerForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen2_5_omni",
        "Qwen2_5OmniThinkerForConditionalGeneration"),
    "Qwen2_5OmniModel": (
        "vllm_main_modify_tpu.models.qwen2_5_omni",
        "Qwen2_5OmniThinkerForConditionalGeneration"),
    "Qwen2_5OmniForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen2_5_omni",
        "Qwen2_5OmniThinkerForConditionalGeneration"),
    # reference registry names for the remote-code checkpoints
    # (AIDC-AI/Ovis2-* use architectures ["Ovis"]; Ovis2.5 "Ovis2_5")
    "Ovis": ("vllm_main_modify_tpu.models.ovis",
             "Ovis2ForConditionalGeneration"),
    "Ovis2_5": ("vllm_main_modify_tpu.models.ovis",
                "Ovis2ForConditionalGeneration"),
    "Ovis2ForConditionalGeneration": ("vllm_main_modify_tpu.models"
                                      ".ovis",
                                      "Ovis2ForConditionalGeneration"),
    "ChameleonForConditionalGeneration": (
        "vllm_main_modify_tpu.models.chameleon",
        "ChameleonForConditionalGeneration"),
    "AriaForConditionalGeneration": ("vllm_main_modify_tpu.models"
                                     ".aria",
                                     "AriaForConditionalGeneration"),
    "Blip2ForConditionalGeneration": ("vllm_main_modify_tpu.models"
                                      ".blip2",
                                      "Blip2ForConditionalGeneration"),
    "LlavaForConditionalGeneration": (
        "vllm_main_modify_tpu.models.registry", "_llava_factory"),
    "PixtralForConditionalGeneration": (
        "vllm_main_modify_tpu.models.pixtral",
        "PixtralForConditionalGeneration"),
    "Glm4vForConditionalGeneration": (
        "vllm_main_modify_tpu.models.glm4v",
        "Glm4vForConditionalGeneration"),
    "Glm4vMoeForConditionalGeneration": (
        "vllm_main_modify_tpu.models.glm4v",
        "Glm4vMoeForConditionalGeneration"),
    "Qwen2VLForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen2_vl",
        "Qwen2VLForConditionalGeneration"),
    "Qwen2_5_VLForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen2_vl",
        "Qwen2_5_VLForConditionalGeneration"),
    "LongcatFlashForCausalLM": (
        "vllm_main_modify_tpu.models.longcat",
        "LongcatFlashForCausalLM"),
    "BailingMoeForCausalLM": (
        "vllm_main_modify_tpu.models.bailing",
        "BailingMoeForCausalLM"),
    "BailingMoeV2ForCausalLM": (
        "vllm_main_modify_tpu.models.bailing",
        "BailingMoeForCausalLM"),
    "BartForConditionalGeneration": (
        "vllm_main_modify_tpu.models.bart",
        "BartForConditionalGeneration"),
    "BartModel": (
        "vllm_main_modify_tpu.models.bart",
        "BartForConditionalGeneration"),
    "MBartForConditionalGeneration": (
        "vllm_main_modify_tpu.models.bart",
        "MBartForConditionalGeneration"),
    "JinaVLForRanking": (
        "vllm_main_modify_tpu.models.qwen2_vl",
        "JinaVLForSequenceClassification"),
    "Tarsier2ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen2_vl",
        "Qwen2VLForConditionalGeneration"),
    "Mistral3ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.mistral3",
        "Mistral3ForConditionalGeneration"),
    "VoxtralForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen2_audio",
        "VoxtralForConditionalGeneration"),
    "UltravoxModel": (
        "vllm_main_modify_tpu.models.qwen2_audio", "UltravoxModel"),
    "Qwen2AudioForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen2_audio",
        "Qwen2AudioForConditionalGeneration"),
    "Qwen3VLForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen3_vl",
        "Qwen3VLForConditionalGeneration"),
    "Qwen3VLMoeForConditionalGeneration": (
        "vllm_main_modify_tpu.models.qwen3_vl",
        "Qwen3VLMoeForConditionalGeneration"),
    # speculative DRAFT heads (see _spec_draft_factory below): the
    # reference registry lists these as draft-worker classes; here
    # spec_decode/ owns them via method auto-detection, and loading
    # one as the MAIN model raises an actionable error
    "EagleLlamaForCausalLM": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "EagleLlama4ForCausalLM": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "EagleMiniCPMForCausalLM": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "Eagle3LlamaForCausalLM": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "LlamaForCausalLMEagle3": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "Eagle3Qwen2_5vlForCausalLM": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "EagleDeepSeekMTPModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "DeepSeekMTPModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "ErnieMTPModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "Glm4MoeMTPModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "LongCatFlashMTPModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "MiMoMTPModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "Qwen3NextMTP": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "MedusaModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "MLPSpeculatorPreTrainedModel": (
        "vllm_main_modify_tpu.models.registry", "_spec_draft_factory"),
    "RForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llava_onevision",
        "RForConditionalGeneration"),
    "GLM4VForCausalLM": ("vllm_main_modify_tpu.models.glm4v_legacy",
                         "GLM4VForCausalLM"),
    "MiDashengLMModel": ("vllm_main_modify_tpu.models.midashenglm",
                         "MiDashengLMModel"),
    "Step3TextForCausalLM": ("vllm_main_modify_tpu.models.step3",
                             "Step3TextForCausalLM"),
    # Step3-VL: vision tower + conv-downsampler projector over the
    # Step3 text decoder (reference: step3_vl.py)
    "Step3VLForConditionalGeneration": (
        "vllm_main_modify_tpu.models.step3",
        "Step3VLForConditionalGeneration"),
    "ArcticForCausalLM": ("vllm_main_modify_tpu.models.arctic",
                          "ArcticForCausalLM"),
    "DeepseekVLV2ForCausalLM": (
        "vllm_main_modify_tpu.models.deepseek_vl2",
        "DeepseekVLV2ForCausalLM"),
    # Kimi-VL: MoonViT + DeepSeek-V2/V3 MLA decoder (reference:
    # vllm/model_executor/models/kimi_vl.py + moonvit.py)
    "KimiVLForConditionalGeneration": (
        "vllm_main_modify_tpu.models.kimi_vl",
        "KimiVLForConditionalGeneration"),
    # dots.ocr: RMSNorm/SwiGLU NaViT + Qwen2 decoder (reference:
    # vllm/model_executor/models/dots_ocr.py)
    "DotsOCRForCausalLM": ("vllm_main_modify_tpu.models.dots_ocr",
                           "DotsOCRForCausalLM"),
    # Keye-VL / Keye-VL-1.5: SigLIP + mlp_AR merge projector over
    # mrope Qwen3 (reference: keye.py + keye_vl1_5.py)
    "KeyeForConditionalGeneration": (
        "vllm_main_modify_tpu.models.keye",
        "KeyeForConditionalGeneration"),
    "KeyeVL1_5ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.keye",
        "KeyeVL1_5ForConditionalGeneration"),
    # ERNIE-4.5-VL MoE: ViT + resampler over modality-routed MoE
    # (reference: ernie45_vl.py + ernie45_vl_moe.py)
    "Ernie4_5_VLMoeForConditionalGeneration": (
        "vllm_main_modify_tpu.models.ernie45_vl",
        "Ernie4_5_VLMoeForConditionalGeneration"),
    "Ernie45VLTextModel": (
        "vllm_main_modify_tpu.models.ernie45_vl",
        "Ernie45VLTextModel"),
    # Molmo: CLIP ViT + 2x2 attention pooling over an OLMo decoder
    # (reference: molmo.py)
    "MolmoForCausalLM": ("vllm_main_modify_tpu.models.molmo",
                         "MolmoForCausalLM"),
    # Nemotron VL family: C-RADIO tower + pixel shuffle (reference:
    # nemotron_vl.py + nano_nemotron_vl.py + radio.py)
    "Llama_Nemotron_Nano_VL": (
        "vllm_main_modify_tpu.models.nemotron_vl",
        "LlamaNemotronVLChatModel"),
    "NemotronH_Nano_VL_V2": (
        "vllm_main_modify_tpu.models.nemotron_vl",
        "NemotronHNanoVLV2"),
    # HyperCLOVA-X Vision: SigLIP + C-Abstractor (reference:
    # hyperclovax_vision.py)
    "HCXVisionForCausalLM": (
        "vllm_main_modify_tpu.models.hyperclovax_vision",
        "HCXVisionForCausalLM"),
    "MiniCPMV": ("vllm_main_modify_tpu.models.minicpmv",
                 "MiniCPMV"),
    # MiniCPM-O 2.6 extends MiniCPM-V 2.6 with audio/tts towers; the
    # vision+text path is identical (the reference's 2.6 loader also
    # skips apm./audio/tts prefixes) — audio inputs are not yet served
    "MiniCPMO": ("vllm_main_modify_tpu.models.minicpmv",
                 "MiniCPMV"),
    # MiniMax-VL-01 is the LLaVA-NeXT anyres recipe (CLIP tower +
    # 2-layer projector + image_newline) over MiniMaxText01
    # (reference: minimax_vl_01.py reuses the llava infrastructure);
    # both halves carry their own parity tests here
    "MiniMaxVL01ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llava",
        "LlavaNextForConditionalGeneration"),
    "Phi4MultimodalForCausalLM": (
        "vllm_main_modify_tpu.models.phi4_multimodal",
        "Phi4MultimodalForCausalLM"),
    "Phi4MMForCausalLM": (
        "vllm_main_modify_tpu.models.phi4_multimodal",
        "Phi4MultimodalForCausalLM"),
    "Gemma3nForCausalLM": ("vllm_main_modify_tpu.models.gemma3n",
                           "Gemma3nForCausalLM"),
    # full multimodal export: the text stack is identical (same
    # model.language_model. keys); the MobileNetV5 vision and USM
    # audio towers are not yet served — text prompts work as-is
    "Gemma3nForConditionalGeneration": (
        "vllm_main_modify_tpu.models.gemma3n", "Gemma3nForCausalLM"),
    "GotOcr2ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.got_ocr2",
        "GotOcr2ForConditionalGeneration"),
    "Cohere2VisionForConditionalGeneration": (
        "vllm_main_modify_tpu.models.aya_vision",
        "Cohere2VisionForConditionalGeneration"),
    "AyaVisionForConditionalGeneration": (
        "vllm_main_modify_tpu.models.aya_vision",
        "AyaVisionForConditionalGeneration"),
    "Llama4ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llama4_mm",
        "Llama4ForConditionalGeneration"),
    "LlavaNextVideoForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llava",
        "LlavaNextVideoForConditionalGeneration"),
    "LlavaNextForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llava",
        "LlavaNextForConditionalGeneration"),
    "Idefics3ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.idefics3",
        "Idefics3ForConditionalGeneration"),
    "SmolVLMForConditionalGeneration": (
        "vllm_main_modify_tpu.models.idefics3",
        "Idefics3ForConditionalGeneration"),
    "MambaForCausalLM": ("vllm_main_modify_tpu.models.mamba",
                         "MambaForCausalLM"),
    "JambaForCausalLM": ("vllm_main_modify_tpu.models.jamba",
                         "JambaForCausalLM"),
    "FalconMambaForCausalLM": ("vllm_main_modify_tpu.models.mamba",
                               "FalconMambaForCausalLM"),
    "Mamba2ForCausalLM": ("vllm_main_modify_tpu.models.mamba",
                          "Mamba2ForCausalLM"),
    "BambaForCausalLM": ("vllm_main_modify_tpu.models.bamba",
                         "BambaForCausalLM"),
    "GraniteMoeHybridForCausalLM": (
        "vllm_main_modify_tpu.models.bamba",
        "GraniteMoeHybridForCausalLM"),
    "Zamba2ForCausalLM": ("vllm_main_modify_tpu.models.zamba2",
                          "Zamba2ForCausalLM"),
    "FalconH1ForCausalLM": ("vllm_main_modify_tpu.models.bamba",
                            "FalconH1ForCausalLM"),
    "BloomForCausalLM": ("vllm_main_modify_tpu.models.bloom",
                         "BloomForCausalLM"),
    "MptForCausalLM": ("vllm_main_modify_tpu.models.mpt",
                       "MptForCausalLM"),
    "MPTForCausalLM": ("vllm_main_modify_tpu.models.mpt",
                       "MptForCausalLM"),
    "OPTForCausalLM": ("vllm_main_modify_tpu.models.opt",
                       "OPTForCausalLM"),
    "GPT2LMHeadModel": ("vllm_main_modify_tpu.models.gpt2",
                        "GPT2LMHeadModel"),
    "GPTNeoXForCausalLM": ("vllm_main_modify_tpu.models.gpt_neox",
                           "GPTNeoXForCausalLM"),
    "FalconForCausalLM": ("vllm_main_modify_tpu.models.falcon",
                          "FalconForCausalLM"),
    "GemmaForCausalLM": ("vllm_main_modify_tpu.models.gemma",
                         "GemmaForCausalLM"),
    "Gemma2ForCausalLM": ("vllm_main_modify_tpu.models.gemma",
                          "Gemma2ForCausalLM"),
    "Gemma3ForCausalLM": ("vllm_main_modify_tpu.models.gemma",
                          "Gemma3ForCausalLM"),
    # encoder-only embedding / cross-encoder families (models/bert.py)
    "BertModel": ("vllm_main_modify_tpu.models.bert",
                  "BertEmbeddingModel"),
    "RobertaModel": ("vllm_main_modify_tpu.models.bert",
                     "RobertaEmbeddingModel"),
    "RobertaForMaskedLM": ("vllm_main_modify_tpu.models.bert",
                           "RobertaEmbeddingModel"),
    "XLMRobertaModel": ("vllm_main_modify_tpu.models.bert",
                        "RobertaEmbeddingModel"),
    "BertForTokenClassification": (
        "vllm_main_modify_tpu.models.bert",
        "BertForTokenClassification"),
    "BertForSequenceClassification": (
        "vllm_main_modify_tpu.models.bert",
        "BertForSequenceClassification"),
    "RobertaForSequenceClassification": (
        "vllm_main_modify_tpu.models.bert",
        "RobertaForSequenceClassification"),
    "XLMRobertaForSequenceClassification": (
        "vllm_main_modify_tpu.models.bert",
        "RobertaForSequenceClassification"),
    # embedding/pooling checkpoints (decoder backbone, no lm_head;
    # reference: pooling adapters vllm/model_executor/layers/pooler.py)
    "LlamaModel": ("vllm_main_modify_tpu.models.registry",
                   "_pooling_llama_factory"),
    "MistralModel": ("vllm_main_modify_tpu.models.registry",
                     "_pooling_llama_factory"),
    "Qwen2Model": ("vllm_main_modify_tpu.models.registry",
                   "_pooling_qwen2_factory"),
    # sequence classification (pooler 'classify'): backbone +
    # score head, last-token pooling
    "LlamaForSequenceClassification": (
        "vllm_main_modify_tpu.models.llama",
        "LlamaForSequenceClassification"),
    "Qwen2ForSequenceClassification": (
        "vllm_main_modify_tpu.models.registry",
        "_seq_cls_qwen2_factory"),
    "GPT2ForSequenceClassification": (
        "vllm_main_modify_tpu.models.gpt2",
        "GPT2ForSequenceClassification"),
    "Qwen2ForRewardModel": ("vllm_main_modify_tpu.models.llama",
                            "Qwen2ForRewardModel"),
    "Qwen2ForProcessRewardModel": (
        "vllm_main_modify_tpu.models.llama", "Qwen2ForRewardModel"),
    # embedding checkpoints of decoder families (reference: the
    # _EMBEDDING_MODELS table maps these onto the decoder classes)
    "Gemma2Model": ("vllm_main_modify_tpu.models.registry",
                    "_pooling_gemma2_factory"),
    "Gemma3TextModel": ("vllm_main_modify_tpu.models.registry",
                        "_pooling_gemma3_factory"),
    # Llama-graph variants (models/llama_variants.py)
    "SolarForCausalLM": ("vllm_main_modify_tpu.models.llama_variants",
                         "SolarForCausalLM"),
    "TeleFLMForCausalLM": (
        "vllm_main_modify_tpu.models.llama_variants",
        "TeleFLMForCausalLM"),
    "TeleChat2ForCausalLM": (
        "vllm_main_modify_tpu.models.llama_variants",
        "TeleChat2ForCausalLM"),
    "MiniCPMForCausalLM": ("vllm_main_modify_tpu.models.registry",
                           "_minicpm_factory"),
    # MiMo: Qwen2 graph; the checkpoint's extra ``model.mtp_layers.*``
    # tensors are ignored by the spec-driven loader (reference:
    # mimo.py:103 skips them the same way)
    "MiMoForCausalLM": ("vllm_main_modify_tpu.models.registry",
                        "_qwen2_factory"),
    "OrionForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                         "OrionForCausalLM"),
    # GritLM (generation + embedding checkpoint; reference gritlm.py
    # wraps llama — embed requests use last-token/mean pooling here)
    "GritLM": ("vllm_main_modify_tpu.models.llama",
               "LlamaForCausalLM"),
    "GptOssForCausalLM": ("vllm_main_modify_tpu.models.gpt_oss",
                          "GptOssForCausalLM"),
    "NemotronHForCausalLM": ("vllm_main_modify_tpu.models.bamba",
                             "NemotronHForCausalLM"),
    "Lfm2ForCausalLM": ("vllm_main_modify_tpu.models.lfm2",
                        "Lfm2ForCausalLM"),
    "Llama4ForCausalLM": ("vllm_main_modify_tpu.models.llama4",
                          "Llama4ForCausalLM"),
    "Gemma3ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.gemma3_mm",
        "Gemma3ForConditionalGeneration"),
    "PaliGemmaForConditionalGeneration": (
        "vllm_main_modify_tpu.models.paligemma",
        "PaliGemmaForConditionalGeneration"),
    "InternVLForConditionalGeneration": (
        "vllm_main_modify_tpu.models.internvl",
        "InternVLForConditionalGeneration"),
    "InternS1ForConditionalGeneration": (
        "vllm_main_modify_tpu.models.internvl",
        "InternVLForConditionalGeneration"),
    # remote-code OpenGVLab layout + derivatives (reference:
    # internvl.py InternVLChatModel, nvlm_d.py:160, h2ovl.py,
    # skyworkr1v.py)
    "InternVLChatModel": (
        "vllm_main_modify_tpu.models.internvl", "InternVLChatModel"),
    "H2OVLChatModel": (
        "vllm_main_modify_tpu.models.internvl", "InternVLChatModel"),
    "SkyworkR1VChatModel": (
        "vllm_main_modify_tpu.models.internvl", "InternVLChatModel"),
    "NVLM_D": (
        "vllm_main_modify_tpu.models.internvl", "NVLM_D_Model"),
    # Tarsier-1: llava checkpoint layout (reference: tarsier.py)
    "TarsierForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llava",
        "LlavaForConditionalGeneration"),
    "LlavaOnevisionForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llava_onevision",
        "LlavaOnevisionForConditionalGeneration"),
    "InternLM2ForRewardModel": (
        "vllm_main_modify_tpu.models.internlm2_baichuan",
        "InternLM2ForRewardModel"),
    "JambaForSequenceClassification": (
        "vllm_main_modify_tpu.models.jamba",
        "JambaForSequenceClassification"),
    # rope-BERT embedders (models/bert_with_rope.py)
    "GteNewModel": ("vllm_main_modify_tpu.models.bert_with_rope",
                    "GteNewModel"),
    "GteModel": ("vllm_main_modify_tpu.models.bert_with_rope",
                 "SnowflakeGteNewModel"),
    "SnowflakeGteNewModel": (
        "vllm_main_modify_tpu.models.bert_with_rope",
        "SnowflakeGteNewModel"),
    "NomicBertModel": ("vllm_main_modify_tpu.models.bert_with_rope",
                       "NomicBertModel"),
    "GteNewForSequenceClassification": (
        "vllm_main_modify_tpu.models.bert_with_rope",
        "GteNewForSequenceClassification"),
    "Qwen3NextForCausalLM": (
        "vllm_main_modify_tpu.models.qwen3_next",
        "Qwen3NextForCausalLM"),
    "MiniMaxText01ForCausalLM": (
        "vllm_main_modify_tpu.models.minimax",
        "MiniMaxText01ForCausalLM"),
    "MiniMaxM1ForCausalLM": (
        "vllm_main_modify_tpu.models.minimax",
        "MiniMaxText01ForCausalLM"),
    "MiniMaxForCausalLM": (
        "vllm_main_modify_tpu.models.minimax",
        "MiniMaxText01ForCausalLM"),
    "Grok1ForCausalLM": ("vllm_main_modify_tpu.models.moe_misc",
                         "Grok1ModelForCausalLM"),
    "Grok1ModelForCausalLM": ("vllm_main_modify_tpu.models.moe_misc",
                              "Grok1ModelForCausalLM"),
    "HunYuanMoEV1ForCausalLM": (
        "vllm_main_modify_tpu.models.moe_misc",
        "HunYuanMoEV1ForCausalLM"),
    "FuyuForCausalLM": ("vllm_main_modify_tpu.models.fuyu",
                        "FuyuForCausalLM"),
    "MiniCPM3ForCausalLM": ("vllm_main_modify_tpu.models.deepseek_v2",
                            "MiniCPM3ForCausalLM"),
    "ChatGLMModel": ("vllm_main_modify_tpu.models.llama_variants",
                     "ChatGLMForCausalLM"),
    "ChatGLMForCausalLM": (
        "vllm_main_modify_tpu.models.llama_variants",
        "ChatGLMForCausalLM"),
    "ChatGLMForConditionalGeneration": (
        "vllm_main_modify_tpu.models.llama_variants",
        "ChatGLMForCausalLM"),
    "ModernBertModel": ("vllm_main_modify_tpu.models.modern_bert",
                        "ModernBertModel"),
    "ModernBertForSequenceClassification": (
        "vllm_main_modify_tpu.models.modern_bert",
        "ModernBertForSequenceClassification"),
    "HunYuanDenseV1ForCausalLM": (
        "vllm_main_modify_tpu.models.misc_decoders",
        "HunYuanDenseV1ForCausalLM"),
    "ApertusForCausalLM": ("vllm_main_modify_tpu.models.misc_decoders",
                           "ApertusForCausalLM"),
    # DeepSeek-V3-routing MoE families (models/moe_v3.py)
    "Glm4MoeForCausalLM": ("vllm_main_modify_tpu.models.moe_v3",
                           "Glm4MoeForCausalLM"),
    "Dots1ForCausalLM": ("vllm_main_modify_tpu.models.moe_v3",
                         "Dots1ForCausalLM"),
    "Ernie4_5_MoeForCausalLM": ("vllm_main_modify_tpu.models.moe_v3",
                                "Ernie4_5_MoeForCausalLM"),
    "DeciLMForCausalLM": (
        "vllm_main_modify_tpu.models.llama_variants",
        "DeciLMForCausalLM"),
    "JAISLMHeadModel": ("vllm_main_modify_tpu.models.gpt2",
                        "JAISLMHeadModel"),
    "Fairseq2LlamaForCausalLM": (
        "vllm_main_modify_tpu.models.llama_variants",
        "Fairseq2LlamaForCausalLM"),
    # Transformers-backend fallback explicit names (reference:
    # registry.py:330-334, model_impl="transformers"). resolve_model_cls
    # also routes unknown *ForCausalLM names here implicitly.
    "TransformersForCausalLM": (
        "vllm_main_modify_tpu.models.transformers_fallback",
        "transformers_fallback_factory"),
    "TransformersModel": (
        "vllm_main_modify_tpu.models.transformers_fallback",
        "transformers_fallback_factory"),
    "TransformersForMultimodalLM": (
        "vllm_main_modify_tpu.models.transformers_fallback",
        "transformers_fallback_factory"),
}


# speculative draft architectures (reference registry
# _SPECULATIVE_DECODING_MODELS): these checkpoints are not standalone
# models — they ride the target model's fused step. Route users to
# speculative_config instead of failing on missing weights.
_DRAFT_ARCHS = (
    "MedusaModel", "EagleLlamaForCausalLM", "Eagle3LlamaForCausalLM",
    "LlamaForCausalLMEagle3", "EagleMiniCPMForCausalLM",
    "EagleLlama4ForCausalLM", "Eagle3Qwen2_5vlForCausalLM",
    "EagleDeepSeekMTPModel", "DeepSeekMTPModel", "ErnieMTPModel",
    "Glm4MoeMTPModel", "MiMoMTPModel", "LongCatFlashMTPModel",
    "Qwen3NextMTP", "MLPSpeculatorPreTrainedModel",
)
for _a in _DRAFT_ARCHS:
    _REGISTRY[_a] = ("vllm_main_modify_tpu.models.registry",
                     "_draft_only_factory")


def _terratorch_factory(config: ModelConfig):
    """PrithviGeoSpatialMAE / Terratorch (reference:
    vllm/model_executor/models/terratorch.py): the reference model is
    a thin shim that delegates the ENTIRE forward — input parsing,
    dummy data, and the geospatial MAE encoder — to the external
    ``terratorch`` package (``from terratorch.vllm import
    InferenceRunner``, terratorch.py:26). There is no in-tree model
    math to port; parity is "run terratorch when installed". This
    environment ships no terratorch, so the reference cannot serve
    these architectures here either."""
    try:
        import terratorch  # noqa: F401
    except ImportError:
        raise ValueError(
            f"{config.architecture!r} requires the external "
            "'terratorch' package (the reference delegates the whole "
            "model to terratorch.vllm.InferenceRunner); install "
            "terratorch to serve geospatial models") from None
    raise NotImplementedError(
        "terratorch is installed but the TPU InferenceRunner bridge "
        "is not wired yet; file an issue with your model config")


for _a in ("PrithviGeoSpatialMAE", "Terratorch"):
    _REGISTRY[_a] = ("vllm_main_modify_tpu.models.registry",
                     "_terratorch_factory")


def _draft_only_factory(config: ModelConfig):
    raise ValueError(
        f"{config.architecture!r} is a speculative-decoding draft "
        "architecture; load it via speculative_config="
        "{'draft_model': <path>, 'num_speculative_tokens': K} on the "
        "target model instead of as a standalone model")


def _minicpm_factory(config: ModelConfig):
    """MiniCPM dense vs MoE split on config num_experts
    (reference: minicpm.py:316-328)."""
    if config.num_experts:
        from vllm_main_modify_tpu.models.llama_variants import \
            MiniCPMMoEForCausalLM

        return MiniCPMMoEForCausalLM(config)
    from vllm_main_modify_tpu.models.llama_variants import \
        MiniCPMForCausalLM

    return MiniCPMForCausalLM(config)


def _use_bias_llama_factory(config: ModelConfig):
    """Llama graph with qkv bias driven by a ``use_bias``/``bias``
    flag (Ernie 4.5, InternLM v1)."""
    from vllm_main_modify_tpu.models.llama import LlamaForCausalLM

    hf = config.hf_config
    config.attention_bias = bool(
        getattr(hf, "use_bias", None) or getattr(hf, "bias", False))
    return LlamaForCausalLM(config)


def _seq_cls_qwen2_factory(config: ModelConfig):
    from vllm_main_modify_tpu.models.llama import \
        LlamaForSequenceClassification

    config.attention_bias = True  # Qwen2 unconditional qkv biases
    return LlamaForSequenceClassification(config)


def _llava_factory(config: ModelConfig):
    """LLaVA checkpoints carry different towers under one arch name
    (reference: llava.py init_vision_tower_for_llava) — HF-format
    Pixtral-12B is a LlavaForConditionalGeneration whose
    vision_config.model_type is 'pixtral'."""
    vc = getattr(config.hf_config, "vision_config", None)
    if getattr(vc, "model_type", "") == "pixtral":
        from vllm_main_modify_tpu.models.pixtral import \
            PixtralHFForConditionalGeneration

        return PixtralHFForConditionalGeneration(config)
    from vllm_main_modify_tpu.models.llava import \
        LlavaForConditionalGeneration

    return LlavaForConditionalGeneration(config)


def _pooling_gemma2_factory(config: ModelConfig):
    from vllm_main_modify_tpu.models.gemma import Gemma2ForCausalLM

    config.is_pooling_model = True
    return Gemma2ForCausalLM(config)


def _pooling_gemma3_factory(config: ModelConfig):
    from vllm_main_modify_tpu.models.gemma import Gemma3ForCausalLM

    config.is_pooling_model = True
    return Gemma3ForCausalLM(config)


def _pooling_llama_factory(config: ModelConfig):
    from vllm_main_modify_tpu.models.llama import LlamaForCausalLM

    config.is_pooling_model = True
    return LlamaForCausalLM(config)


def _pooling_qwen2_factory(config: ModelConfig):
    config.attention_bias = True
    return _pooling_llama_factory(config)


def _qwen_v1_factory(config: ModelConfig):
    if getattr(config.hf_config, "visual", None):
        from vllm_main_modify_tpu.models.qwen_vl import \
            QwenVLForConditionalGeneration

        return QwenVLForConditionalGeneration(config)
    from vllm_main_modify_tpu.models.internlm2_baichuan import \
        QWenLMHeadModel

    return QWenLMHeadModel(config)


def _qwen2_factory(config: ModelConfig):
    from vllm_main_modify_tpu.models.llama import LlamaForCausalLM

    # HF Qwen2 uses unconditional q/k/v biases (no config flag).
    config.attention_bias = True
    return LlamaForCausalLM(config)


# Speculative DRAFT architectures (reference registry.py lists these
# as loadable model classes for its draft worker). Here the draft
# subsystem instantiates them inside spec_decode/ (eagle.py, mtp.py,
# medusa, mlp-speculator) keyed by the same names via
# config._detect_spec_method — a draft head cannot decode standalone
# (it needs the target's hidden states), so loading one as the MAIN
# model routes to an actionable error instead of a broken engine.
_SPEC_DRAFT_ARCHS = tuple(
    a for a, (m, f) in _REGISTRY.items()
    if f == "_spec_draft_factory")


def _spec_draft_factory(config: ModelConfig):
    raise ValueError(
        f"{config.architecture} is a speculative-decoding DRAFT head "
        "— it consumes the target model's hidden states and cannot "
        "serve standalone. Pass it as "
        "speculative_config={'model': <this checkpoint>} on the "
        "target model instead (method auto-detected from the "
        "architecture name).")





def resolve_model_cls(architecture: str) -> Callable:
    if architecture in ("TransformersForCausalLM", "TransformersModel"):
        # explicit opt-in names (reference: registry.py:330-334 —
        # model_impl="transformers"): route straight to the fallback
        from vllm_main_modify_tpu.models.transformers_fallback \
            import transformers_fallback_factory

        return transformers_fallback_factory
    if architecture not in _REGISTRY:
        if architecture.endswith("ForCausalLM"):
            # transformers-backend fallback (reference:
            # models/transformers.py @ registry.py:330-334): any
            # llama-layout decoder serves without registration; the
            # factory raises a clear error otherwise
            from vllm_main_modify_tpu.models.transformers_fallback \
                import transformers_fallback_factory

            return transformers_fallback_factory
        raise ValueError(
            f"Architecture {architecture!r} is not supported yet. "
            f"Known: {sorted(_REGISTRY)}")
    module, attr = _REGISTRY[architecture]
    return getattr(importlib.import_module(module), attr)


def create_model(config: ModelConfig):
    return resolve_model_cls(config.architecture)(config)


def list_supported_archs() -> list[str]:
    return sorted(_REGISTRY)
