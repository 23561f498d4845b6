"""Logit parity vs HuggingFace for every supported architecture
(reference test pattern: vLlmRunner-vs-HfRunner, tests/conftest.py:256).
Tiny random-weight checkpoints; both sides load identical safetensors.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vllm_main_modify_tpu.config import ModelConfig  # noqa: E402
from vllm_main_modify_tpu.layers.attention import \
    AttentionMetadata  # noqa: E402
from vllm_main_modify_tpu.models.loader import \
    load_model_weights  # noqa: E402
from vllm_main_modify_tpu.models.registry import \
    create_model  # noqa: E402


def build_checkpoint(tmp_path, arch: str):
    import torch
    import transformers

    kw = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=128)
    if arch == "qwen3":
        cfg = transformers.Qwen3Config(**kw, head_dim=16)
        cls = transformers.Qwen3ForCausalLM
    elif arch == "qwen2":
        cfg = transformers.Qwen2Config(**kw)
        cls = transformers.Qwen2ForCausalLM
    elif arch == "gemma":
        cfg = transformers.GemmaConfig(**kw, head_dim=16)
        cls = transformers.GemmaForCausalLM
    elif arch == "gemma2":
        cfg = transformers.Gemma2Config(
            **kw, head_dim=16, query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            sliding_window=32)
        cls = transformers.Gemma2ForCausalLM
    elif arch == "gemma3":
        cfg = transformers.Gemma3TextConfig(
            **dict(kw, num_hidden_layers=4), head_dim=16,
            query_pre_attn_scalar=16, sliding_window=8,
            sliding_window_pattern=2, rope_local_base_freq=10000.0,
            rope_theta=1000000.0,
            rope_scaling={"rope_type": "linear", "factor": 8.0})
        cls = transformers.Gemma3ForCausalLM
    elif arch == "mixtral":
        cfg = transformers.MixtralConfig(
            **kw, num_local_experts=4, num_experts_per_tok=2)
        cls = transformers.MixtralForCausalLM
    elif arch == "qwen2_moe":
        cfg = transformers.Qwen2MoeConfig(
            **kw, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=64,
            shared_expert_intermediate_size=96,
            decoder_sparse_step=1, norm_topk_prob=False)
        cls = transformers.Qwen2MoeForCausalLM
    elif arch.startswith("deepseek_v2"):
        dskw = dict(kw, num_hidden_layers=3, num_key_value_heads=4,
                    kv_lora_rank=32, q_lora_rank=48,
                    qk_nope_head_dim=16, qk_rope_head_dim=8,
                    v_head_dim=16, n_routed_experts=4,
                    num_experts_per_tok=2, n_shared_experts=1,
                    moe_intermediate_size=32, first_k_dense_replace=1,
                    topk_method="greedy", norm_topk_prob=False,
                    routed_scaling_factor=1.0, aux_loss_alpha=0.0)
        if arch == "deepseek_v2_group":
            dskw.update(topk_method="group_limited_greedy", n_group=2,
                        topk_group=1, routed_scaling_factor=1.5,
                        q_lora_rank=None)
        cfg = transformers.DeepseekV2Config(**dskw)
        cls = transformers.DeepseekV2ForCausalLM
    elif arch == "deepseek_v3":
        cfg = transformers.DeepseekV3Config(
            **dict(kw, num_hidden_layers=3, num_key_value_heads=4),
            kv_lora_rank=32, q_lora_rank=48, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16, n_routed_experts=8,
            n_group=4, topk_group=2, num_experts_per_tok=2,
            n_shared_experts=1, moe_intermediate_size=32,
            first_k_dense_replace=1, norm_topk_prob=True,
            routed_scaling_factor=2.5)
        cls = transformers.DeepseekV3ForCausalLM
    elif arch == "phi3":
        cfg = transformers.Phi3Config(**kw, pad_token_id=0)
        cls = transformers.Phi3ForCausalLM
    elif arch == "granite":
        cfg = transformers.GraniteConfig(
            **kw, embedding_multiplier=2.0, residual_multiplier=0.5,
            logits_scaling=3.0, attention_multiplier=0.1)
        cls = transformers.GraniteForCausalLM
    elif arch == "starcoder2":
        cfg = transformers.Starcoder2Config(**kw, use_bias=True)
        cls = transformers.Starcoder2ForCausalLM
    elif arch == "stablelm":
        cfg = transformers.StableLmConfig(**kw, use_qkv_bias=True)
        cls = transformers.StableLmForCausalLM
    elif arch == "phi":
        cfg = transformers.PhiConfig(**kw)
        cls = transformers.PhiForCausalLM
    elif arch == "cohere":
        cfg = transformers.CohereConfig(**kw, use_qk_norm=True,
                                        logit_scale=0.0625)
        cls = transformers.CohereForCausalLM
    elif arch == "olmo2":
        cfg = transformers.Olmo2Config(**kw)
        cls = transformers.Olmo2ForCausalLM
    elif arch == "olmo3":
        cfg = transformers.Olmo3Config(
            **dict(kw, num_hidden_layers=4), sliding_window=8,
            layer_types=["sliding_attention", "sliding_attention",
                         "sliding_attention", "full_attention"],
            rope_scaling={"rope_type": "linear", "factor": 2.0})
        cls = transformers.Olmo3ForCausalLM
    elif arch == "smollm3":
        cfg = transformers.SmolLM3Config(
            **kw, no_rope_layers=[1, 0], no_rope_layer_interval=2,
            pad_token_id=0)
        cls = transformers.SmolLM3ForCausalLM
    elif arch == "glm4":
        cfg = transformers.Glm4Config(
            **kw, head_dim=16, partial_rotary_factor=0.5,
            attention_bias=True, pad_token_id=0)
        cls = transformers.Glm4ForCausalLM
    elif arch == "nemotron":
        cfg = transformers.NemotronConfig(**kw)
        cls = transformers.NemotronForCausalLM
    elif arch == "bloom":
        cfg = transformers.BloomConfig(
            vocab_size=256, hidden_size=64, n_layer=2, n_head=4)
        cls = transformers.BloomForCausalLM
    elif arch == "mpt":
        cfg = transformers.MptConfig(
            vocab_size=256, d_model=64, n_layers=2, n_heads=4)
        cls = transformers.MptForCausalLM
    elif arch == "opt":
        cfg = transformers.OPTConfig(
            vocab_size=256, hidden_size=64, ffn_dim=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=128, do_layer_norm_before=True,
            word_embed_proj_dim=64)
        cls = transformers.OPTForCausalLM
    elif arch == "gpt2":
        cfg = transformers.GPT2Config(
            vocab_size=256, n_embd=64, n_layer=2, n_head=4,
            n_positions=128)
        cls = transformers.GPT2LMHeadModel
    elif arch.startswith("gpt_neox"):
        nx = dict(kw, num_key_value_heads=4, rotary_pct=0.25,
                  use_parallel_residual=True)
        if arch == "gpt_neox_seq":
            nx.update(use_parallel_residual=False, rotary_pct=1.0)
        cfg = transformers.GPTNeoXConfig(**nx)
        cls = transformers.GPTNeoXForCausalLM
    elif arch.startswith("falcon"):
        fkw = dict(vocab_size=256, hidden_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   alibi=False, bias=False, multi_query=True,
                   parallel_attn=True, new_decoder_architecture=False,
                   tie_word_embeddings=True)
        if arch == "falcon_40b":
            fkw.update(new_decoder_architecture=True, num_kv_heads=2)
        elif arch == "falcon_rw":
            fkw.update(multi_query=False, parallel_attn=False,
                       bias=True)
        cfg = transformers.FalconConfig(**fkw)
        cls = transformers.FalconForCausalLM
    elif arch == "gptj":
        cfg = transformers.GPTJConfig(
            vocab_size=256, n_embd=64, n_layer=2, n_head=4,
            rotary_dim=8, n_positions=128)
        cls = transformers.GPTJForCausalLM
    elif arch == "gpt_neo":
        cfg = transformers.GPTNeoConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            attention_types=[[["global", "local"], 1]], window_size=8,
            max_position_embeddings=128)
        cls = transformers.GPTNeoForCausalLM
    elif arch == "gpt_bigcode":
        cfg = transformers.GPTBigCodeConfig(
            vocab_size=256, n_embd=64, n_layer=2, n_head=4,
            n_positions=128, multi_query=True)
        cls = transformers.GPTBigCodeForCausalLM
    elif arch == "persimmon":
        cfg = transformers.PersimmonConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=128, partial_rotary_factor=0.5)
        cls = transformers.PersimmonForCausalLM
    elif arch == "olmo":
        cfg = transformers.OlmoConfig(**kw, clip_qkv=0.4)
        cls = transformers.OlmoForCausalLM
    elif arch == "arcee":
        cfg = transformers.ArceeConfig(**kw)
        cls = transformers.ArceeForCausalLM
    elif arch == "seed_oss":
        cfg = transformers.SeedOssConfig(**kw, head_dim=16)
        cls = transformers.SeedOssForCausalLM
    elif arch == "ernie4_5":
        cfg = transformers.Ernie4_5Config(**kw, use_bias=True,
                                          pad_token_id=0)
        cls = transformers.Ernie4_5ForCausalLM
    elif arch == "glm":
        cfg = transformers.GlmConfig(
            **kw, head_dim=16, partial_rotary_factor=0.5,
            attention_bias=True, pad_token_id=0)
        cls = transformers.GlmForCausalLM
    elif arch == "cohere2":
        cfg = transformers.Cohere2Config(
            **kw, sliding_window=8, sliding_window_pattern=2,
            logit_scale=0.0625)
        cls = transformers.Cohere2ForCausalLM
    elif arch == "exaone4":
        cfg = transformers.Exaone4Config(
            **dict(kw, num_hidden_layers=4), sliding_window=8,
            sliding_window_pattern=4)
        cls = transformers.Exaone4ForCausalLM
    elif arch == "dbrx":
        cfg = transformers.DbrxConfig(
            d_model=64, n_heads=4, n_layers=2, max_seq_len=128,
            vocab_size=256,
            attn_config=dict(kv_n_heads=2, rope_theta=10000,
                             clip_qkv=8.0),
            ffn_config=dict(ffn_hidden_size=32, moe_num_experts=4,
                            moe_top_k=2))
        cls = transformers.DbrxForCausalLM
    elif arch == "phimoe":
        cfg = transformers.PhimoeConfig(
            **kw, num_local_experts=4, num_experts_per_tok=2,
            router_jitter_noise=0.01, attention_bias=True,
            lm_head_bias=True)
        cls = transformers.PhimoeForCausalLM
    elif arch == "olmoe":
        cfg = transformers.OlmoeConfig(
            **kw, num_experts=4, num_experts_per_tok=2,
            norm_topk_prob=False)
        cls = transformers.OlmoeForCausalLM
    elif arch == "granitemoe":
        cfg = transformers.GraniteMoeConfig(
            **kw, num_local_experts=4, num_experts_per_tok=2,
            embedding_multiplier=2.0, residual_multiplier=0.5,
            logits_scaling=3.0, attention_multiplier=0.1)
        cls = transformers.GraniteMoeForCausalLM
    elif arch == "granitemoeshared":
        cfg = transformers.GraniteMoeSharedConfig(
            **kw, num_local_experts=4, num_experts_per_tok=2,
            shared_intermediate_size=48)
        cls = transformers.GraniteMoeSharedForCausalLM
    elif arch == "qwen3_moe":
        cfg = transformers.Qwen3MoeConfig(
            **kw, head_dim=16, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=64, norm_topk_prob=True,
            decoder_sparse_step=1, mlp_only_layers=[])
        cls = transformers.Qwen3MoeForCausalLM
    else:
        raise ValueError(arch)
    torch.manual_seed(0)
    model = cls(cfg).to(torch.float32).eval()  # GPT-2 defaults to
    # nonzero dropout; eval() makes every family deterministic
    if arch == "deepseek_v3":
        # exercise the selection-only correction bias (zero-init'd)
        with torch.no_grad():
            for layer in model.model.layers:
                gate = getattr(layer.mlp, "gate", None)
                if gate is not None and hasattr(
                        gate, "e_score_correction_bias"):
                    gate.e_score_correction_bias.normal_(std=0.5)
    path = tmp_path / arch
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def run_ours(model_dir: str, token_ids: list[int]) -> np.ndarray:
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)

    t = len(token_ids)
    t_pad = 32
    page = 8
    kv_heads, kv_dim, kv_layers = model.kv_cache_spec()
    kv = jnp.zeros((kv_layers, 8, page, 2 * kv_heads, kv_dim),
                   jnp.float32)
    n_pages = -(-t // page)
    bt = np.zeros((8, 4), np.int32)
    bt[0, :n_pages] = np.arange(1, n_pages + 1)
    meta = AttentionMetadata(
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, t] + [t] * 7, dtype=jnp.int32),
        seq_lens=jnp.asarray([t] + [0] * 7, dtype=jnp.int32),
        slot_mapping=jnp.asarray(
            [page + i for i in range(t)] + [-1] * (t_pad - t),
            dtype=jnp.int32),
        num_seqs=jnp.asarray([1], dtype=jnp.int32),
    )
    ids = jnp.asarray(token_ids + [0] * (t_pad - t), dtype=jnp.int32)
    pos = jnp.asarray(list(range(t)) + [0] * (t_pad - t),
                      dtype=jnp.int32)
    hidden, _ = model(params, ids, pos, kv, meta, use_pallas=False)
    logits = model.compute_logits(params, hidden[:t])
    return np.asarray(logits)


def run_hf(hf_model, token_ids: list[int]) -> np.ndarray:
    import torch

    with torch.no_grad():
        out = hf_model(torch.tensor([token_ids])).logits
    return out[0].float().numpy()


ARCHS = ["qwen2", "qwen3", "gemma", "gemma2", "gemma3", "mixtral",
         "qwen2_moe",
         "deepseek_v2", "deepseek_v2_group", "deepseek_v3",
         "qwen3_moe", "gpt2", "gpt_neox", "gpt_neox_seq", "falcon",
         "falcon_40b", "falcon_rw", "phi3", "granite", "starcoder2",
         "stablelm", "phi", "cohere", "olmo2", "smollm3", "glm4",
         "nemotron", "bloom", "mpt", "opt", "gptj", "gpt_neo",
         "gpt_bigcode", "persimmon", "olmo", "arcee", "seed_oss",
         "ernie4_5", "glm", "olmoe", "granitemoe", "granitemoeshared",
         "cohere2", "exaone4", "olmo3", "dbrx", "phimoe"]


@pytest.mark.parametrize("arch", ARCHS)
def test_logit_parity(arch, tmp_path):
    path, hf_model = build_checkpoint(tmp_path, arch)
    token_ids = [3, 17, 91, 200, 45, 12, 7, 150, 33, 99]
    ref = run_hf(hf_model, token_ids)
    got = run_ours(path, token_ids)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
