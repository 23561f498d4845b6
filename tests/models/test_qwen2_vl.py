"""Qwen2-VL / Qwen2.5-VL parity vs HuggingFace: mrope positions, ViT
(+2.5 window attention), patch merger, and image+text logits
(reference test pattern: vLlmRunner-vs-HfRunner multimodal)."""

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
SIZE = 16  # canonical pixels; patch 4 -> grid 4; merge 2 -> 4 tokens


def build_checkpoint(tmp_path, v25: bool):
    import torch
    import transformers

    common = dict(vocab_size=128, hidden_size=32,
                  intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2,
                  max_position_embeddings=128,
                  rope_scaling={"type": "mrope",
                                "mrope_section": [2, 1, 1]},
                  image_token_id=IMG_TOKEN,
                  vision_start_token_id=VSTART, tie_word_embeddings=False)
    if v25:
        cfg = transformers.Qwen2_5_VLConfig(
            **common,
            vision_config=dict(
                depth=2, hidden_size=32, out_hidden_size=32,
                intermediate_size=64, num_heads=4, patch_size=4,
                spatial_merge_size=2, temporal_patch_size=2,
                window_size=8, fullatt_block_indexes=[1],
                tokens_per_second=2))
        cls = transformers.Qwen2_5_VLForConditionalGeneration
    else:
        cfg = transformers.Qwen2VLConfig(
            **common,
            vision_config=dict(depth=2, embed_dim=32, hidden_size=32,
                               num_heads=4, patch_size=4,
                               spatial_merge_size=2,
                               temporal_patch_size=2, mlp_ratio=2))
        cls = transformers.Qwen2VLForConditionalGeneration
    torch.manual_seed(0)
    model = cls(cfg).to(torch.float32).eval()
    path = tmp_path / ("qwen25vl" if v25 else "qwen2vl")
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def hf_patchify(pixels: np.ndarray, patch: int, merge: int,
                tp: int) -> np.ndarray:
    """HF Qwen2VLImageProcessor patch raster for one [3,S,S] image."""
    c, s, _ = pixels.shape
    g = s // patch
    x = np.broadcast_to(pixels[None], (tp, c, s, s))
    x = x.reshape(tp, c, g // merge, merge, patch, g // merge, merge,
                  patch)
    # (grid_t=1, gh/m, gw/m, m, m, C, tp, p, p)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    return x.reshape(g * g, c * tp * patch * patch)


def run_hf(hf_model, token_ids, pixels):
    import torch

    grid = SIZE // 4
    flat = hf_patchify(pixels, 4, 2, 2)
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor([token_ids]),
            pixel_values=torch.tensor(flat),
            image_grid_thw=torch.tensor([[1, grid, grid]]))
    return out.logits[0].float().numpy()


def run_ours(model_dir, token_ids, pixels, mrope_pos):
    from jax.sharding import Mesh

    config = ModelConfig(model=model_dir, dtype="float32",
                         max_model_len=128, mm_image_size=SIZE)
    model = create_model(config)
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
    scatter = np.full(t_pad, -1, np.int32)
    img_rows = [i for i, tok in enumerate(token_ids)
                if tok == IMG_TOKEN]
    n_img_tok = feats.shape[0] * feats.shape[1]
    feats_flat = feats.reshape(n_img_tok, -1)
    for j, r in enumerate(img_rows):
        scatter[j] = r
    # mm_embeds rows beyond the image tokens scatter to -1 (dropped)
    mm_embeds = feats_flat
    mm_scatter = np.full(n_img_tok, -1, np.int32)
    for j, r in enumerate(img_rows):
        mm_scatter[j] = r
    hidden, _ = model(params, ids, jnp.asarray(pos3), kv, meta,
                      use_pallas=False,
                      mm_embeds=mm_embeds,
                      mm_scatter=jnp.asarray(mm_scatter))
    logits = model.compute_logits(params, hidden[:t])
    return np.asarray(logits)


@pytest.mark.parametrize("v25", [False, True])
def test_qwen2_vl_parity(v25, tmp_path):
    from vllm_main_modify_tpu.models.qwen2_vl import \
        compute_mrope_positions

    path, hf = build_checkpoint(tmp_path, v25)
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, SIZE, SIZE)).astype(np.float32)
    n_img = 4  # (16/4/2)^2 merged tokens
    token_ids = ([5, 9, VSTART] + [IMG_TOKEN] * n_img +
                 [17, 42, 99, 7])
    pos3, delta = compute_mrope_positions(token_ids, IMG_TOKEN,
                                          [(1, 4, 4)], 2)
    ref = run_hf(hf, token_ids, pixels)
    got = run_ours(path, token_ids, pixels, pos3)
    np.testing.assert_allclose(got, ref, atol=3e-3, rtol=3e-3)


def test_mrope_positions_match_hf(tmp_path):
    """compute_mrope_positions == HF get_rope_index."""
    import torch

    from vllm_main_modify_tpu.models.qwen2_vl import \
        compute_mrope_positions

    path, hf = build_checkpoint(tmp_path, False)
    n_img = 4
    token_ids = ([5, 9, VSTART] + [IMG_TOKEN] * n_img +
                 [17, 42, 99, 7])
    pos_hf, delta_hf = hf.model.get_rope_index(
        torch.tensor([token_ids]),
        image_grid_thw=torch.tensor([[1, 4, 4]]))
    pos, delta = compute_mrope_positions(token_ids, IMG_TOKEN,
                                         [(1, 4, 4)], 2)
    np.testing.assert_array_equal(pos, pos_hf[:, 0].numpy())
    assert delta == int(delta_hf[0].item())