"""Qwen3-VL parity vs HuggingFace: DeepStack ViT (pos-embed
interpolation + per-layer visual injection), interleaved mrope, and
image+text logits (reference: vllm qwen3_vl.py)."""

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

IMG_TOKEN = 120
VSTART = 121
SIZE = 32  # patch 8 -> grid 4; merge 2 -> 4 tokens


def build_checkpoint(tmp_path):
    import torch
    import transformers

    cfg = transformers.Qwen3VLConfig(
        vision_config=dict(depth=4, hidden_size=32,
                           intermediate_size=64, num_heads=4,
                           patch_size=8, temporal_patch_size=2,
                           spatial_merge_size=2, out_hidden_size=48,
                           num_position_embeddings=16,
                           deepstack_visual_indexes=[0, 2]),
        text_config=dict(vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, max_position_embeddings=128,
                         rope_scaling=dict(rope_type="default",
                                           mrope_section=[4, 2, 2],
                                           mrope_interleaved=True),
                         tie_word_embeddings=False),
        image_token_id=IMG_TOKEN, video_token_id=122,
        vision_start_token_id=VSTART)
    torch.manual_seed(0)
    hf = transformers.Qwen3VLForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path / "tiny-qwen3vl"
    hf.save_pretrained(path, safe_serialization=True)
    return str(path), hf


def hf_patchify(pixels, patch, merge, tp):
    c, s, _ = pixels.shape
    g = s // patch
    x = np.broadcast_to(pixels[None], (tp, c, s, s))
    x = x.reshape(tp, c, g // merge, merge, patch, g // merge, merge,
                  patch)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    return x.reshape(g * g, c * tp * patch * patch)


def test_qwen3_vl_parity(tmp_path):
    import torch

    path, hf = build_checkpoint(tmp_path)
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, SIZE, SIZE)).astype(np.float32)
    n_img = 4
    token_ids = ([5, 9, VSTART] + [IMG_TOKEN] * n_img +
                 [17, 42, 99, 7])
    grid = SIZE // 8

    flat = hf_patchify(pixels, 8, 2, 2)
    with torch.no_grad():
        ref = hf(torch.tensor([token_ids]),
                 pixel_values=torch.tensor(flat),
                 image_grid_thw=torch.tensor([[1, grid, grid]])
                 ).logits[0].float().numpy()
    pos_hf, _ = hf.model.get_rope_index(
        torch.tensor([token_ids]),
        image_grid_thw=torch.tensor([[1, grid, grid]]))
    mrope_pos = pos_hf[:, 0].numpy().astype(np.int32)

    config = ModelConfig(model=path, dtype="float32",
                         max_model_len=128, mm_image_size=SIZE)
    model = create_model(config)
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    feats = model.encode_images(params, jnp.asarray(pixels[None]))
    t = len(token_ids)
    t_pad = 32
    page = 8
    kv_heads, kv_dim, kv_layers = model.kv_cache_spec()
    kv = jnp.zeros((kv_layers, 8, page, 2 * kv_heads, kv_dim),
                   jnp.float32)
    bt = np.zeros((8, 4), np.int32)
    bt[0, :2] = [1, 2]
    meta = AttentionMetadata(
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, t] + [t] * 7, jnp.int32),
        seq_lens=jnp.asarray([t] + [0] * 7, jnp.int32),
        slot_mapping=jnp.asarray(
            [page + i for i in range(t)] + [-1] * (t_pad - t),
            jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
    )
    ids = jnp.asarray(token_ids + [0] * (t_pad - t), jnp.int32)
    pos3 = np.zeros((3, t_pad), np.int32)
    pos3[:, :t] = mrope_pos
    n_tok = feats.shape[0] * feats.shape[1]
    feats_flat = feats.reshape(n_tok, -1)
    img_rows = [i for i, tok in enumerate(token_ids)
                if tok == IMG_TOKEN]
    mm_scatter = np.full(n_tok, -1, np.int32)
    for j, r in enumerate(img_rows):
        mm_scatter[j] = r
    hidden, _ = model(params, ids, jnp.asarray(pos3), kv, meta,
                      use_pallas=False, mm_embeds=feats_flat,
                      mm_scatter=jnp.asarray(mm_scatter))
    got = np.asarray(model.compute_logits(params, hidden[:t]))
    np.testing.assert_allclose(got, ref, atol=3e-3, rtol=3e-3)


def test_qwen3_vl_mrope_positions_match_hf(tmp_path):
    import torch

    from vllm_main_modify_tpu.models.qwen2_vl import \
        compute_mrope_positions

    path, hf = build_checkpoint(tmp_path)
    n_img = 4
    token_ids = ([5, 9, VSTART] + [IMG_TOKEN] * n_img +
                 [17, 42, 99, 7])
    pos_hf, delta_hf = hf.model.get_rope_index(
        torch.tensor([token_ids]),
        image_grid_thw=torch.tensor([[1, 4, 4]]))
    pos, delta = compute_mrope_positions(token_ids, IMG_TOKEN,
                                         [(1, 4, 4)], 2)
    np.testing.assert_array_equal(pos, pos_hf[:, 0].numpy())
    assert delta == int(delta_hf[0])


def test_qwen3_vl_engine_greedy(tmp_path):
    """Full engine drive: DeepStack mm buffer carries (1+nds)*H per
    image token; greedy matches HF generate."""
    import torch

    from tests.conftest import _save_tiny_tokenizer
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    path, hf = build_checkpoint(tmp_path)
    import pathlib
    _save_tiny_tokenizer(pathlib.Path(path))
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(3, SIZE, SIZE)).astype(np.float32)
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128, mm_image_size=SIZE)
    prompt_ids = [5, 9, VSTART, IMG_TOKEN, 17, 42]
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": pixels}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0]
    expanded = [5, 9, VSTART] + [IMG_TOKEN] * 4 + [17, 42]
    flat = hf_patchify(pixels, 8, 2, 2)
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(flat),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0)
    ref = gen[0, len(expanded):].tolist()
    assert list(out.outputs[0].token_ids) == ref


def test_qwen3_vl_moe_parity(tmp_path):
    """Qwen3-VL-MoE: fused-expert text decoder (gate_up_proj raw
    parameter) + the DeepStack ViT."""
    import torch
    import transformers

    cfg = transformers.Qwen3VLMoeConfig(
        vision_config=dict(depth=2, hidden_size=32,
                           intermediate_size=64, num_heads=4,
                           patch_size=8, temporal_patch_size=2,
                           spatial_merge_size=2, out_hidden_size=48,
                           num_position_embeddings=16,
                           deepstack_visual_indexes=[0]),
        text_config=dict(vocab_size=512, hidden_size=48,
                         intermediate_size=96,
                         moe_intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16,
                         num_experts=4, num_experts_per_tok=2,
                         max_position_embeddings=128,
                         rope_scaling=dict(rope_type="default",
                                           mrope_section=[4, 2, 2],
                                           mrope_interleaved=True),
                         tie_word_embeddings=False),
        image_token_id=IMG_TOKEN, video_token_id=122,
        vision_start_token_id=VSTART)
    torch.manual_seed(0)
    hf = transformers.Qwen3VLMoeForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path / "tiny-qwen3vl-moe"
    hf.save_pretrained(path, safe_serialization=True)

    token_ids = [5, 9, VSTART] + [IMG_TOKEN] * 4 + [17, 42]
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(3, SIZE, SIZE)).astype(np.float32)
    flat = hf_patchify(pixels, 8, 2, 2)
    with torch.no_grad():
        ref = hf(torch.tensor([token_ids]),
                 pixel_values=torch.tensor(flat),
                 image_grid_thw=torch.tensor([[1, 4, 4]])
                 ).logits[0].float().numpy()
    pos_hf, _ = hf.model.get_rope_index(
        torch.tensor([token_ids]),
        image_grid_thw=torch.tensor([[1, 4, 4]]))

    config = ModelConfig(model=str(path), dtype="float32",
                         max_model_len=128, mm_image_size=SIZE)
    model = create_model(config)
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)
    feats = model.encode_images(params, jnp.asarray(pixels[None]))
    t = len(token_ids)
    t_pad = 32
    page = 8
    kv_heads, kv_dim, kv_layers = model.kv_cache_spec()
    kv = jnp.zeros((kv_layers, 8, page, 2 * kv_heads, kv_dim),
                   jnp.float32)
    bt = np.zeros((8, 4), np.int32)
    bt[0, :2] = [1, 2]
    meta = AttentionMetadata(
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, t] + [t] * 7, jnp.int32),
        seq_lens=jnp.asarray([t] + [0] * 7, jnp.int32),
        slot_mapping=jnp.asarray(
            [page + i for i in range(t)] + [-1] * (t_pad - t),
            jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
    )
    ids = jnp.asarray(token_ids + [0] * (t_pad - t), jnp.int32)
    pos3 = np.zeros((3, t_pad), np.int32)
    pos3[:, :t] = pos_hf[:, 0].numpy().astype(np.int32)
    n_tok = feats.shape[0] * feats.shape[1]
    feats_flat = feats.reshape(n_tok, -1)
    img_rows = [i for i, tok in enumerate(token_ids)
                if tok == IMG_TOKEN]
    mm_scatter = np.full(n_tok, -1, np.int32)
    for j, r in enumerate(img_rows):
        mm_scatter[j] = r
    hidden, _ = model(params, ids, jnp.asarray(pos3), kv, meta,
                      use_pallas=False, mm_embeds=feats_flat,
                      mm_scatter=jnp.asarray(mm_scatter))
    got = np.asarray(model.compute_logits(params, hidden[:t]))
    np.testing.assert_allclose(got, ref, atol=3e-3, rtol=3e-3)
