"""Image chat over the OpenAI server (reference: chat-completions
image_url content parts, vllm/entrypoints/chat_utils.py)."""

import asyncio
import base64
import io

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                         LoadConfig, ModelConfig,
                                         SchedulerConfig)
from vllm_main_modify_tpu.engine.async_llm import AsyncLLM
from vllm_main_modify_tpu.entrypoints.openai.api_server import \
    OpenAIServer

IMG_TOK = 250


@pytest.fixture(scope="module")
def llava_dir(tmp_path_factory):
    import torch
    import transformers

    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=16, patch_size=8)
    tc = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    cfg = transformers.LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK)
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).to(
        torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-llava-srv"
    hf.save_pretrained(path, safe_serialization=True)
    # image preprocessor so PIL inputs normalize server-side
    transformers.CLIPImageProcessor(
        size={"shortest_edge": 16},
        crop_size={"height": 16, "width": 16}).save_pretrained(path)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path)


@pytest.fixture(scope="module")
def client(llava_dir):
    config = EngineConfig(
        model_config=ModelConfig(model=llava_dir, dtype="float32",
                                 max_model_len=128),
        cache_config=CacheConfig(block_size=4, num_gpu_blocks=256),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=8,
                                         max_model_len=128),
        load_config=LoadConfig(load_format="auto"),
    )
    eng = AsyncLLM(config)
    server = OpenAIServer(eng, served_model_name="tiny-llava")
    app = server.build_app()
    loop = asyncio.new_event_loop()

    async def make():
        c = TestClient(TestServer(app))
        await c.start_server()
        return c

    c = loop.run_until_complete(make())
    yield c, loop
    loop.run_until_complete(c.close())
    loop.close()
    eng.shutdown()


def _data_url():
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return "data:image/png;base64," + \
        base64.b64encode(buf.getvalue()).decode()


def post(client, path, payload):
    c, loop = client

    async def run():
        resp = await c.post(path, json=payload)
        return resp.status, await resp.json()

    return loop.run_until_complete(run())


def test_chat_with_image(client):
    status, data = post(client, "/v1/chat/completions", {
        "model": "tiny-llava",
        "messages": [{
            "role": "user",
            "content": [
                {"type": "text", "text": "describe "},
                {"type": "image_url",
                 "image_url": {"url": _data_url()}},
                {"type": "text", "text": " please"},
            ],
        }],
        "max_tokens": 8,
        "temperature": 0.0,
        "ignore_eos": True,
    })
    assert status == 200, data
    msg = data["choices"][0]["message"]
    assert msg["role"] == "assistant"
    # 4 image patch tokens expanded into the prompt accounting
    assert data["usage"]["prompt_tokens"] > 6


def test_chat_image_http_url_rejected(client):
    status, data = post(client, "/v1/chat/completions", {
        "model": "tiny-llava",
        "messages": [{
            "role": "user",
            "content": [{"type": "image_url", "image_url": {
                "url": "http://example.com/cat.png"}}],
        }],
        "max_tokens": 4,
    })
    assert status == 400
    assert "data:" in str(data)


def test_text_only_chat_still_works(client):
    status, data = post(client, "/v1/chat/completions", {
        "model": "tiny-llava",
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 4,
        "ignore_eos": True,
    })
    assert status == 200, data
