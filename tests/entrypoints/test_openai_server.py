"""OpenAI server integration tests over real HTTP (reference style:
tests/entrypoints/openai/ — drive the routes, assert protocol)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_main_modify_tpu.config import (CacheConfig, EngineConfig,
                                         LoadConfig, ModelConfig,
                                         SchedulerConfig)
from vllm_main_modify_tpu.engine.async_llm import AsyncLLM
from vllm_main_modify_tpu.entrypoints.openai.api_server import \
    OpenAIServer


@pytest.fixture(scope="module")
def engine(tiny_llama_dir):
    config = EngineConfig(
        model_config=ModelConfig(model=tiny_llama_dir, dtype="float32",
                                 max_model_len=128),
        cache_config=CacheConfig(block_size=4, num_gpu_blocks=256),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=8,
                                         max_model_len=128),
        load_config=LoadConfig(load_format="auto"),
    )
    eng = AsyncLLM(config)
    yield eng
    eng.shutdown()


@pytest.fixture()
def client(engine, event_loop=None):
    server = OpenAIServer(engine, served_model_name="tiny-llama")
    app = server.build_app()

    async def make():
        c = TestClient(TestServer(app))
        await c.start_server()
        return c

    loop = asyncio.new_event_loop()
    c = loop.run_until_complete(make())
    yield c, loop
    loop.run_until_complete(c.close())
    loop.close()


def post(client, path, payload):
    c, loop = client

    async def run():
        resp = await c.post(path, json=payload)
        return resp.status, await resp.json()

    return loop.run_until_complete(run())


def get(client, path):
    c, loop = client

    async def run():
        resp = await c.get(path)
        return resp.status, await resp.text()

    return loop.run_until_complete(run())


def test_health_and_models(client):
    status, _ = get(client, "/health")
    assert status == 200
    status, text = get(client, "/v1/models")
    assert status == 200
    data = json.loads(text)
    assert data["data"][0]["id"] == "tiny-llama"


def test_completions(client):
    status, data = post(
        client, "/v1/completions", {
            "model": "tiny-llama",
            "prompt": "hello world",
            "max_tokens": 8,
            "temperature": 0,
            "ignore_eos": True,
        })
    assert status == 200, data
    assert data["object"] == "text_completion"
    assert data["choices"][0]["finish_reason"] == "length"
    assert data["usage"]["completion_tokens"] == 8
    assert isinstance(data["choices"][0]["text"], str)


def test_completions_batch(client):
    status, data = post(
        client, "/v1/completions", {
            "prompt": ["hello", "world test"],
            "max_tokens": 4,
            "temperature": 0,
            "ignore_eos": True,
        })
    assert status == 200, data
    assert len(data["choices"]) == 2
    assert {c["index"] for c in data["choices"]} == {0, 1}


def test_chat_completions(client):
    status, data = post(
        client, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 6,
            "temperature": 0,
            "ignore_eos": True,
        })
    assert status == 200, data
    assert data["object"] == "chat.completion"
    msg = data["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)
    assert data["usage"]["completion_tokens"] == 6


def test_chat_streaming(client):
    c, loop = client

    async def run():
        resp = await c.post(
            "/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4,
                "temperature": 0,
                "stream": True,
                "ignore_eos": True,
                # tiny model may greedily emit special tokens, which
                # would detokenize to "" and make the test vacuous
                "skip_special_tokens": False,
            })
        assert resp.status == 200
        assert resp.content_type == "text/event-stream"
        chunks = []
        async for line in resp.content:
            line = line.decode().strip()
            if line.startswith("data: "):
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                chunks.append(json.loads(payload))
        return chunks

    chunks = loop.run_until_complete(run())
    assert chunks[0]["choices"][0]["delta"]["role"] == "assistant"
    # 1 role chunk + one chunk per step (deltas may be "" when the
    # random model emits partial-UTF8 byte tokens that the incremental
    # detokenizer holds back)
    assert len(chunks) >= 2
    assert all("content" in ch["choices"][0]["delta"] for ch in chunks)
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"


def test_error_empty_messages(client):
    status, data = post(client, "/v1/chat/completions",
                        {"messages": [], "max_tokens": 4})
    assert status == 400
    assert "messages" in data["message"]


def test_error_bad_params(client):
    status, data = post(
        client, "/v1/completions",
        {"prompt": "x", "temperature": -2.0, "max_tokens": 2})
    assert status == 400


def test_tokenize_detokenize(client):
    status, data = post(client, "/tokenize", {"prompt": "hello world"})
    assert status == 200
    assert data["count"] == len(data["tokens"]) > 0
    status2, data2 = post(client, "/detokenize",
                          {"tokens": data["tokens"]})
    assert status2 == 200
    assert "hello" in data2["prompt"]


def test_metrics_endpoint(client):
    status, text = get(client, "/metrics")
    assert status == 200
    assert "vllm:num_requests_running" in text


# ---- /v1/responses (reference: api_server.py create_responses) ----


def test_responses_basic(client):
    status, body = post(client, "/v1/responses", {
        "input": "hello there",
        "max_output_tokens": 6,
        "temperature": 0.0,
    })
    assert status == 200, body
    assert body["object"] == "response"
    assert body["status"] == "completed"
    assert body["output"][0]["role"] == "assistant"
    text = body["output"][0]["content"][0]["text"]
    assert body["output_text"] == text
    assert body["usage"]["output_tokens"] == 6


def test_responses_chaining(client):
    status, first = post(client, "/v1/responses", {
        "input": "one", "max_output_tokens": 4, "temperature": 0.0,
        "store": True,
    })
    assert status == 200
    status, second = post(client, "/v1/responses", {
        "input": "two", "max_output_tokens": 4, "temperature": 0.0,
        "previous_response_id": first["id"],
    })
    assert status == 200
    assert second["previous_response_id"] == first["id"]
    # unknown chain id → 400
    status, err = post(client, "/v1/responses", {
        "input": "x", "previous_response_id": "resp_nope",
    })
    assert status == 400


def test_responses_background_and_retrieve(client):
    c, loop = client
    status, body = post(client, "/v1/responses", {
        "input": "background run",
        "max_output_tokens": 5, "temperature": 0.0,
        "background": True,
    })
    assert status == 200
    assert body["status"] in ("in_progress", "completed")
    rid = body["id"]

    async def poll():
        import asyncio as aio

        for _ in range(200):
            resp = await c.get(f"/v1/responses/{rid}")
            doc = await resp.json()
            if doc["status"] == "completed":
                return doc
            await aio.sleep(0.05)
        raise AssertionError("background response never completed")

    doc = loop.run_until_complete(poll())
    # random weights may decode to empty text; usage is the witness
    assert doc["usage"]["output_tokens"] == 5
    assert doc["output"][0]["role"] == "assistant"
    # retrieval of unknown id → 404
    status, _ = get(client, "/v1/responses/resp_missing")
    assert status == 404


def test_responses_cancel(client):
    status, body = post(client, "/v1/responses", {
        "input": "long run",
        "max_output_tokens": 100, "temperature": 0.0,
        "background": True,
    })
    assert status == 200
    rid = body["id"]
    status, doc = post(client, f"/v1/responses/{rid}/cancel", {})
    assert status == 200
    assert doc["status"] in ("cancelled", "completed")


def test_responses_streaming(client):
    c, loop = client

    async def run():
        resp = await c.post("/v1/responses", json={
            "input": "stream me", "max_output_tokens": 5,
            "temperature": 0.0, "stream": True,
        })
        assert resp.status == 200
        raw = (await resp.read()).decode()
        return raw

    raw = loop.run_until_complete(run())
    assert "event: response.created" in raw
    assert "event: response.output_text.delta" in raw
    assert "event: response.completed" in raw


def test_pooling_endpoint(client):
    status, body = post(client, "/pooling", {"input": "pool me"})
    assert status == 200, body
    assert body["object"] == "list"
    assert body["data"][0]["object"] == "pooling"
    vec = body["data"][0]["data"]
    assert isinstance(vec, list) and len(vec) > 0
    # raw hidden states: NOT unit-normalized (embeddings are)
    import math

    norm = math.sqrt(sum(v * v for v in vec))
    assert abs(norm - 1.0) > 1e-3


def test_tool_choice_forcing(client):
    """tool_choice named-function / "required" constrain decoding to
    the tool schema via guided JSON (reference: serving_chat.py)."""
    tools = [{
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"enum": ["sf", "nyc"]}},
                "required": ["city"],
            },
        },
    }]
    status, data = post(client, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "weather in sf?"}],
        "tools": tools,
        "tool_choice": {"type": "function",
                        "function": {"name": "get_weather"}},
        "max_tokens": 120, "temperature": 0.0,
    })
    assert status == 200, data
    msg = data["choices"][0]["message"]
    assert data["choices"][0]["finish_reason"] == "tool_calls"
    call = msg["tool_calls"][0]["function"]
    assert call["name"] == "get_weather"
    args = json.loads(call["arguments"])
    assert args["city"] in ("sf", "nyc")

    # "required" over multiple tools
    tools.append({
        "type": "function",
        "function": {"name": "get_time",
                     "parameters": {"type": "object",
                                    "properties": {}}},
    })
    status, data = post(client, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "anything"}],
        "tools": tools, "tool_choice": "required",
        "max_tokens": 120, "temperature": 0.0,
    })
    assert status == 200, data
    name = data["choices"][0]["message"]["tool_calls"][0][
        "function"]["name"]
    assert name in ("get_weather", "get_time")

    # unknown function name → 400
    status, _ = post(client, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "x"}],
        "tools": tools,
        "tool_choice": {"type": "function",
                        "function": {"name": "nope"}},
        "max_tokens": 8,
    })
    assert status == 400
