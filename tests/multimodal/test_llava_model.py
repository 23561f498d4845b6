"""LLaVA model-level HF parity: vision tower features, projector, and
merged-decoder logits (reference: vllm/model_executor/models/llava.py
and clip.py)."""

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

IMG_TOK = 250


@pytest.fixture(scope="module")
def llava_ckpt(tmp_path_factory):
    import torch
    import transformers

    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=16, patch_size=8)
    tc = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    cfg = transformers.LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-llava"
    hf.save_pretrained(path, safe_serialization=True)
    return str(path), hf


def test_vision_features_match(llava_ckpt):
    import torch

    path, hf = llava_ckpt
    config = ModelConfig(model=path, dtype="float32",
                         max_model_len=128)
    assert config.is_multimodal and config.image_token_index == IMG_TOK
    model = create_model(config)
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(model.encode_images(params, jnp.asarray(pix)))
    with torch.no_grad():
        ref = hf.get_image_features(
            pixel_values=torch.tensor(pix),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        if isinstance(ref, (list, tuple)):
            ref = torch.stack(list(ref))
    ref = ref.reshape(ours.shape).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_merged_logits_match(llava_ckpt):
    import torch

    path, hf = llava_ckpt
    config = ModelConfig(model=path, dtype="float32",
                         max_model_len=128)
    model = create_model(config)
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    params = load_model_weights(model, config, mesh)

    rng = np.random.default_rng(1)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    # 4 patch tokens for a 16/8 grid
    token_ids = [5, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 7, 9, 42]
    t = len(token_ids)
    t_pad = 16
    page = 8
    kvh, kvd, kvl = model.kv_cache_spec()
    kv = jnp.zeros((kvl, 8, page, 2 * kvh, kvd), jnp.float32)
    bt = np.zeros((8, 4), np.int32)
    bt[0, :1] = [1]
    meta = AttentionMetadata(
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, t] + [t] * 7, jnp.int32),
        seq_lens=jnp.asarray([t] + [0] * 7, jnp.int32),
        slot_mapping=jnp.asarray(
            [page + i for i in range(t)] + [-1] * (t_pad - t),
            jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
    )
    feats = model.encode_images(params, jnp.asarray(pix))
    feats = feats.reshape(-1, feats.shape[-1])  # [4, H]
    mm_scatter = jnp.asarray([1, 2, 3, 4], jnp.int32)
    ids = jnp.asarray(token_ids + [0] * (t_pad - t), jnp.int32)
    pos = jnp.asarray(list(range(t)) + [0] * (t_pad - t), jnp.int32)
    hidden, _ = model(params, ids, pos, kv, meta, use_pallas=False,
                      mm_embeds=feats, mm_scatter=mm_scatter)
    logits = np.asarray(model.compute_logits(params, hidden[:t]))

    with torch.no_grad():
        out = hf(input_ids=torch.tensor([token_ids]),
                 pixel_values=torch.tensor(pix))
    ref = out.logits[0].numpy()
    np.testing.assert_allclose(logits, ref, atol=2e-3, rtol=2e-3)
