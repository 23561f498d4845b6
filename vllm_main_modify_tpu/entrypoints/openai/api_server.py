"""OpenAI-compatible HTTP server.

Reference: vllm/entrypoints/openai/api_server.py (FastAPI routes
:345-1240) + serving_chat.py / serving_completion.py. Built on aiohttp
(FastAPI is not in this image); same route surface and SSE streaming
semantics:

  POST /v1/completions           POST /v1/chat/completions
  GET  /v1/models                GET  /health        GET /version
  POST /tokenize                 POST /detokenize
  GET  /metrics (Prometheus)     POST /reset_prefix_cache
  POST /start_profile            POST /stop_profile
  GET  /audit/* (structured-output audit admin, §5.9 fork delta)
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
from typing import AsyncGenerator, Optional

from aiohttp import web

from vllm_main_modify_tpu import envs
from vllm_main_modify_tpu.engine.async_llm import AsyncLLM, EngineDeadError
from vllm_main_modify_tpu.entrypoints.openai.protocol import (
    ChatCompletionChoice, ChatCompletionRequest, ChatCompletionResponse,
    ChatCompletionStreamChoice, ChatCompletionStreamResponse,
    ChatMessage, CompletionChoice, CompletionRequest,
    CompletionResponse, DeltaMessage, DetokenizeRequest,
    DetokenizeResponse, EmbeddingData, EmbeddingRequest,
    EmbeddingResponse, ErrorResponse, ModelCard, ModelList,
    ResponsesRequest, TokenizeRequest, TokenizeResponse, UsageInfo,
    random_uuid)
from vllm_main_modify_tpu.metrics.prometheus import PrometheusMetrics

logger = logging.getLogger(__name__)


def error_json(status: int, message: str, etype: str = "BadRequestError"):
    return web.json_response(
        ErrorResponse(message=message, type=etype,
                      code=status).model_dump(), status=status)


class OpenAIServer:

    def __init__(self, engine: AsyncLLM, served_model_name: str,
                 tool_call_parser: Optional[str] = None,
                 reasoning_parser: Optional[str] = None) -> None:
        self.engine = engine
        self.config = engine.config
        self.model_name = served_model_name
        self.tokenizer = engine.tokenizer
        self.max_model_len = engine.config.model_config.max_model_len
        self.metrics = PrometheusMetrics(engine)
        self.tool_parser = None
        if tool_call_parser:
            from vllm_main_modify_tpu.entrypoints.openai.tool_parsers \
                import get_tool_parser

            self.tool_parser = get_tool_parser(tool_call_parser)
        self.reasoning_parser = None
        if reasoning_parser:
            from vllm_main_modify_tpu.reasoning import \
                get_reasoning_parser

            self.reasoning_parser = get_reasoning_parser(
                reasoning_parser)
        # /v1/responses store (reference: serving_responses.py
        # response_store + background tasks)
        self._responses: dict[str, dict] = {}
        self._response_tasks: dict[str, asyncio.Task] = {}

    # ------------------------------------------------------------------

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=64 * 1024 * 1024)
        r = app.router
        r.add_get("/health", self.health)
        r.add_get("/version", self.version)
        r.add_get("/v1/models", self.models)
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/v1/responses", self.responses)
        r.add_get("/v1/responses/{response_id}", self.get_response)
        r.add_post("/v1/responses/{response_id}/cancel",
                   self.cancel_response)
        r.add_post("/v1/embeddings", self.embeddings)
        r.add_post("/pooling", self.pooling)
        r.add_post("/v1/pooling", self.pooling)
        r.add_post("/score", self.score)
        r.add_post("/v1/score", self.score)
        r.add_post("/rerank", self.rerank)
        r.add_post("/v1/rerank", self.rerank)
        r.add_post("/v2/rerank", self.rerank)
        r.add_post("/classify", self.classify)
        r.add_post("/v1/audio/transcriptions", self.transcriptions)
        r.add_post("/v1/audio/translations", self.translations)
        r.add_post("/tokenize", self.tokenize)
        r.add_post("/detokenize", self.detokenize)
        r.add_get("/metrics", self.prometheus_metrics)
        r.add_post("/reset_prefix_cache", self.reset_prefix_cache)
        r.add_post("/sleep", self.sleep)
        r.add_post("/wake_up", self.wake_up)
        r.add_post("/reload_weights", self.reload_weights)
        r.add_post("/v1/load_lora_adapter", self.load_lora_adapter)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_get("/load", self.server_load)
        r.add_get("/server_info", self.server_info)
        # Remote-admin surface: only in dev mode (reference gates
        # these behind VLLM_SERVER_DEV_MODE, api_server.py) —
        # /collective_rpc can invoke arbitrary runner methods and
        # must never ship on a production listener.
        if envs.VLLM_SERVER_DEV_MODE:
            r.add_post("/scale_elastic_ep", self.scale_elastic_ep)
            r.add_post("/collective_rpc", self.collective_rpc)
        try:
            from vllm_main_modify_tpu.structured_output.audit_admin import \
                register_audit_routes

            register_audit_routes(r, self.engine)
        except ImportError:
            pass
        return app

    # ---- misc endpoints ----------------------------------------------

    async def health(self, request: web.Request) -> web.Response:
        if not self.engine.is_healthy():
            return web.Response(status=503, text="engine dead")
        return web.Response(text="")

    async def version(self, request: web.Request) -> web.Response:
        from vllm_main_modify_tpu import __version__

        return web.json_response({"version": __version__})

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response(
            ModelList(data=[ModelCard(id=self.model_name)]).model_dump())

    async def tokenize(self, request: web.Request) -> web.Response:
        body = TokenizeRequest(**await request.json())
        if body.messages is not None:
            text, _ = self._apply_chat_template(body.messages, True)
        else:
            text = body.prompt or ""
        ids = self.tokenizer.encode(
            text, add_special_tokens=body.add_special_tokens)
        return web.json_response(
            TokenizeResponse(count=len(ids),
                             max_model_len=self.max_model_len,
                             tokens=ids).model_dump())

    async def detokenize(self, request: web.Request) -> web.Response:
        body = DetokenizeRequest(**await request.json())
        text = self.tokenizer.decode(body.tokens)
        return web.json_response(
            DetokenizeResponse(prompt=text).model_dump())

    async def prometheus_metrics(self,
                                 request: web.Request) -> web.Response:
        return web.Response(body=self.metrics.render(),
                            content_type="text/plain")

    async def reset_prefix_cache(self,
                                 request: web.Request) -> web.Response:
        self.engine.engine_core.reset_prefix_cache()
        return web.Response(text="")

    async def sleep(self, request: web.Request) -> web.Response:
        level = int(request.query.get("level", "1"))
        self.engine.engine_core.sleep(level)
        return web.Response(text="")

    async def wake_up(self, request: web.Request) -> web.Response:
        self.engine.engine_core.wake_up()
        return web.Response(text="")

    async def reload_weights(self,
                             request: web.Request) -> web.Response:
        self.engine.engine_core.reload_weights()
        return web.Response(text="")

    async def server_load(self, request: web.Request) -> web.Response:
        """Reference: /load — current number of in-flight requests
        on this API server (server_load_metrics)."""
        n = len(self.engine._output_streams)
        return web.json_response({"server_load": n})

    async def server_info(self, request: web.Request) -> web.Response:
        """Reference: /server_info — engine config summary."""
        mc = self.config.model_config
        sc = self.config.scheduler_config
        return web.json_response({
            "model": mc.model,
            "dtype": str(mc.dtype),
            "max_model_len": mc.max_model_len,
            "max_num_seqs": sc.max_num_seqs,
            "max_num_batched_tokens": sc.max_num_batched_tokens,
            "block_size": self.config.cache_config.block_size,
        })

    # Methods invocable over /collective_rpc even in dev mode: a
    # caller-supplied method name must not reach arbitrary runner
    # internals (the route is itself gated behind
    # VLLM_SERVER_DEV_MODE; this is defense in depth).
    COLLECTIVE_RPC_ALLOWED = frozenset({
        "reload_weights", "save_sharded_state", "sleep", "wake_up",
        "capture_model",
    })

    async def collective_rpc(self,
                             request: web.Request) -> web.Response:
        """Reference: /collective_rpc — invoke a method on the
        worker(s). Single-controller design: one runner."""
        body = await request.json()
        method = body.get("method")
        runner = getattr(self.engine.engine_core, "model_runner",
                         None)
        if runner is None:
            return error_json(400, "engine core is remote; "
                              "collective_rpc unavailable")
        if method not in self.COLLECTIVE_RPC_ALLOWED:
            return error_json(
                400, f"method {method!r} is not allowlisted for "
                "collective_rpc")
        fn = getattr(runner, method, None)
        if fn is None or not callable(fn):
            return error_json(400, f"unknown method {method!r}")
        try:
            result = fn(*body.get("args", []),
                        **(body.get("kwargs") or {}))
        except Exception as e:  # noqa: BLE001
            return error_json(400, repr(e))
        return web.json_response({"result": repr(result)})

    async def load_lora_adapter(self,
                                request: web.Request) -> web.Response:
        body = await request.json()
        runner = self.engine.engine_core.model_runner
        if runner.lora_manager is None:
            return error_json(400, "LoRA is not enabled")
        runner.lora_manager.register(body["lora_name"],
                                     body["lora_path"])
        return web.Response(text="")

    async def scale_elastic_ep(self,
                               request: web.Request) -> web.Response:
        """Elastic scale of data-parallel engines (reference:
        /scale_elastic_ep, api_server.py + v1/engine/utils.py:473
        elastic EP): grow by spawning engines, shrink by draining."""
        body = await request.json()
        new_size = int(body.get("new_data_parallel_size", 0))
        if new_size < 1:
            return error_json(400, "new_data_parallel_size must "
                              "be >= 1")
        core = self.engine.engine_core
        if not hasattr(core, "scale"):
            return error_json(
                400, "engine is not running data-parallel "
                "(start with data_parallel_size > 1 to scale)")
        size = core.scale(new_size)
        return web.json_response({"data_parallel_size": size})

    async def start_profile(self, request: web.Request) -> web.Response:
        self.engine.engine_core.profile_start()
        return web.Response(text="")

    async def stop_profile(self, request: web.Request) -> web.Response:
        self.engine.engine_core.profile_stop()
        return web.Response(text="")

    # ---- /v1/audio/transcriptions ------------------------------------

    @staticmethod
    def _decode_wav(data: bytes):
        """PCM WAV → mono float32 waveform + rate (stdlib only — no
        audio-codec deps in this environment)."""
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(data)) as w:
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            channels = w.getnchannels()
            rate = w.getframerate()
        if width == 2:
            wav = np.frombuffer(raw, dtype=np.int16).astype(
                np.float32) / 32768.0
        elif width == 1:
            wav = (np.frombuffer(raw, dtype=np.uint8).astype(
                np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported WAV sample width {width}")
        if channels > 1:
            wav = wav.reshape(-1, channels).mean(axis=1)
        return wav, rate

    def _whisper_task_prompt(self, task: str,
                             language: Optional[str]) -> Optional[list]:
        """Decoder prompt with the task token (reference: Whisper task
        forcing in the audio serving path — <|translate|> vs
        <|transcribe|>). None when the tokenizer lacks Whisper's task
        tokens (the model default then applies)."""
        tok = getattr(self.engine, "tokenizer", None)
        if tok is None:
            return None

        def tid(t):
            try:
                i = tok.convert_tokens_to_ids(t)
            except Exception:  # noqa: BLE001
                return None
            unk = getattr(tok, "unk_token_id", None)
            return None if i is None or i == unk else i

        task_id = tid(f"<|{task}|>")
        sot = tid("<|startoftranscript|>")
        if task_id is None or sot is None:
            return None
        ids = [sot]
        if language:
            lang_id = tid(f"<|{language.lower()}|>")
            if lang_id is not None:
                ids.append(lang_id)
        ids.append(task_id)
        nts = tid("<|notimestamps|>")
        if nts is not None:
            ids.append(nts)
        return ids

    async def transcriptions(self, request: web.Request,
                             task: str = "transcribe") -> web.Response:
        """Whisper transcription/translation (reference:
        /v1/audio/{transcriptions,translations},
        serving_transcription.py). Multipart form: file (WAV), model,
        temperature, language."""
        from vllm_main_modify_tpu.sampling_params import SamplingParams

        try:
            form = await request.post()
            file_field = form.get("file")
            if file_field is None:
                return error_json(400, "file is required")
            wav, rate = self._decode_wav(file_field.file.read())
            temperature = float(form.get("temperature", 0.0))
            language = form.get("language") or None
        except ValueError as e:
            return error_json(400, str(e))
        except Exception as e:  # noqa: BLE001
            return error_json(400, f"could not decode audio: {e}")
        params = SamplingParams(temperature=temperature,
                                max_tokens=self.max_model_len // 2)
        prompt = {"multi_modal_data": {"audio": (wav, rate)}}
        task_ids = self._whisper_task_prompt(task, language)
        if task_ids is not None:
            prompt["prompt_token_ids"] = task_ids
        try:
            final = None
            async for out in self.engine.generate(
                    prompt, params, f"{task}-{random_uuid()}"):
                final = out
        except ValueError as e:
            return error_json(400, str(e))
        return web.json_response({"text": final.outputs[0].text})

    async def translations(self, request: web.Request) -> web.Response:
        """Whisper X->English translation: same pipeline with the
        <|translate|> task token forced."""
        return await self.transcriptions(request, task="translate")

    # ---- /score /rerank /classify ------------------------------------

    async def _pooled_vec(self, text, params):
        import numpy as np

        final = None
        async for out in self.engine.generate(
                text, params, f"pool-{random_uuid()}"):
            final = out
        return np.asarray(final.data, dtype=np.float32)

    async def score(self, request: web.Request) -> web.Response:
        """Pairwise similarity over the embedding model (reference:
        /score route, embed-model path)."""
        from vllm_main_modify_tpu.sampling_params import PoolingParams

        try:
            body = await request.json()
            t1 = body.get("text_1") or body.get("query")
            t2 = body.get("text_2") or body.get("documents")
            if t1 is None or t2 is None:
                return error_json(400, "text_1 and text_2 required")
            if isinstance(t1, str):
                t1 = [t1]
            if isinstance(t2, str):
                t2 = [t2]
            if len(t1) == 1 and len(t2) > 1:
                t1 = t1 * len(t2)
            if len(t1) != len(t2):
                return error_json(
                    400, "text_1/text_2 length mismatch")
            data = []
            total = 0
            for i, (a, b) in enumerate(zip(t1, t2)):
                va = await self._pooled_vec(a, PoolingParams())
                vb = await self._pooled_vec(b, PoolingParams())
                data.append({"index": i, "object": "score",
                             "score": float((va * vb).sum())})
        except ValueError as e:
            return error_json(400, str(e))
        return web.json_response({
            "id": f"score-{random_uuid()}", "object": "list",
            "model": self.model_name, "data": data,
            "usage": {"prompt_tokens": total, "total_tokens": total},
        })

    async def rerank(self, request: web.Request) -> web.Response:
        """Cohere-style rerank (reference: /rerank /v1/rerank
        /v2/rerank routes)."""
        from vllm_main_modify_tpu.sampling_params import PoolingParams

        try:
            body = await request.json()
            query = body.get("query")
            docs = body.get("documents") or []
            if not query or not docs:
                return error_json(400, "query and documents required")
            top_n = int(body.get("top_n", len(docs)))
            vq = await self._pooled_vec(query, PoolingParams())
            results = []
            for i, doc in enumerate(docs):
                vd = await self._pooled_vec(doc, PoolingParams())
                results.append({
                    "index": i,
                    "document": {"text": doc},
                    "relevance_score": float((vq * vd).sum()),
                })
            results.sort(key=lambda r: r["relevance_score"],
                         reverse=True)
        except ValueError as e:
            return error_json(400, str(e))
        return web.json_response({
            "id": f"rerank-{random_uuid()}",
            "model": self.model_name,
            "results": results[:top_n],
        })

    async def classify(self, request: web.Request) -> web.Response:
        """Classification over a sequence-classification model
        (reference: /classify route, pooler 'classify')."""
        from vllm_main_modify_tpu.sampling_params import PoolingParams

        try:
            body = await request.json()
            inputs = body.get("input")
            if isinstance(inputs, str):
                inputs = [inputs]
            if not inputs:
                return error_json(400, "input required")
            data = []
            for i, item in enumerate(inputs):
                probs = await self._pooled_vec(
                    item, PoolingParams(task="classify"))
                data.append({
                    "index": i,
                    "label": int(probs.argmax()),
                    "probs": [float(p) for p in probs],
                    "num_classes": len(probs),
                })
        except ValueError as e:
            return error_json(400, str(e))
        return web.json_response({
            "id": f"classify-{random_uuid()}", "object": "list",
            "model": self.model_name, "data": data,
        })

    # ---- /v1/embeddings ----------------------------------------------

    async def embeddings(self, request: web.Request) -> web.Response:
        import base64

        import numpy as np

        from vllm_main_modify_tpu.sampling_params import PoolingParams

        try:
            body = EmbeddingRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return error_json(400, f"invalid request: {e}")
        inputs = body.input
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        data = []
        prompt_tokens = 0
        try:
            for i, item in enumerate(inputs):
                rid = f"embd-{random_uuid()}"
                final = None
                async for out in self.engine.generate(
                        item, PoolingParams(), rid):
                    final = out
                vec = np.asarray(final.data, dtype=np.float32)
                prompt_tokens += len(final.prompt_token_ids)
                if body.encoding_format == "base64":
                    emb = base64.b64encode(vec.tobytes()).decode()
                else:
                    emb = vec.tolist()
                data.append(EmbeddingData(index=i, embedding=emb))
        except ValueError as e:
            return error_json(400, str(e))
        resp = EmbeddingResponse(
            model=body.model or self.model_name, data=data,
            usage=UsageInfo(prompt_tokens=prompt_tokens,
                            total_tokens=prompt_tokens))
        return web.json_response(resp.model_dump())

    async def pooling(self, request: web.Request) -> web.Response:
        """Raw pooled hidden states — /pooling (reference:
        api_server.py create_pooling / serving_pooling.py): like
        /v1/embeddings but UN-normalized, object type 'pooling'."""
        import numpy as np

        from vllm_main_modify_tpu.sampling_params import PoolingParams

        try:
            body = EmbeddingRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return error_json(400, f"invalid request: {e}")
        inputs = body.input
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        data = []
        prompt_tokens = 0
        try:
            for i, item in enumerate(inputs):
                rid = f"pool-{random_uuid()}"
                final = None
                async for out in self.engine.generate(
                        item, PoolingParams(normalize=False), rid):
                    final = out
                vec = np.asarray(final.data, dtype=np.float32)
                prompt_tokens += len(final.prompt_token_ids)
                data.append({"object": "pooling", "index": i,
                             "data": vec.tolist()})
        except ValueError as e:
            return error_json(400, str(e))
        return web.json_response({
            "object": "list", "data": data,
            "model": body.model or self.model_name,
            "usage": {"prompt_tokens": prompt_tokens,
                      "total_tokens": prompt_tokens},
        })

    # ---- /v1/completions ---------------------------------------------

    async def completions(self, request: web.Request) -> web.Response:
        try:
            body = CompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return error_json(400, f"invalid request: {e}")
        prompts = body.prompt
        if isinstance(prompts, str):
            prompts = [prompts]
        elif prompts and isinstance(prompts[0], int):
            prompts = [prompts]
        if len(prompts) != 1 and body.stream:
            return error_json(400, "streaming supports a single prompt")
        try:
            params = body.to_sampling_params(
                default_max_tokens=self.max_model_len)
        except ValueError as e:
            return error_json(400, str(e))

        request_id = f"cmpl-{random_uuid()}"
        if body.stream:
            return await self._stream_completion(request, body,
                                                 prompts[0], params,
                                                 request_id)
        choices = []
        prompt_tokens = completion_tokens = 0
        try:
            for i, prompt in enumerate(prompts):
                final = None
                async for out in self.engine.generate(
                        prompt, params, f"{request_id}-{i}"):
                    final = out
                assert final is not None
                co = final.outputs[0]
                text = co.text
                if body.echo:
                    text = (final.prompt or "") + text
                choices.append(
                    CompletionChoice(
                        index=i, text=text,
                        finish_reason=co.finish_reason,
                        logprobs=self._fmt_completion_logprobs(co)))
                prompt_tokens += len(final.prompt_token_ids)
                completion_tokens += len(co.token_ids)
        except ValueError as e:
            return error_json(400, str(e))
        except EngineDeadError as e:
            return error_json(500, str(e), "InternalServerError")
        resp = CompletionResponse(
            model=body.model or self.model_name, choices=choices,
            usage=UsageInfo(
                prompt_tokens=prompt_tokens,
                completion_tokens=completion_tokens,
                total_tokens=prompt_tokens + completion_tokens))
        return web.json_response(resp.model_dump())

    async def _stream_completion(self, request, body, prompt, params,
                                 request_id) -> web.StreamResponse:
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)
        try:
            async for out in self.engine.generate(prompt, params,
                                                  request_id):
                co = out.outputs[0]
                chunk = CompletionResponse(
                    id=request_id, model=body.model or self.model_name,
                    choices=[
                        CompletionChoice(
                            index=0, text=co.text,
                            finish_reason=co.finish_reason)
                    ])
                await resp.write(
                    f"data: {json.dumps(chunk.model_dump())}\n\n"
                    .encode())
        except (ValueError, EngineDeadError) as e:
            err = {"error": {"message": str(e)}}
            await resp.write(f"data: {json.dumps(err)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    # ---- /v1/chat/completions ----------------------------------------

    # sentinel spliced where image content parts sit; the final token
    # stream replaces each with image_token_index, avoiding any
    # placeholder-string/tokenizer round-trip ambiguity
    _MM_SENTINEL = "\x00<mm-image>\x00"

    def _apply_chat_template(self, messages: list[ChatMessage],
                             add_generation_prompt: bool,
                             chat_template: Optional[str] = None
                             ) -> tuple[str, list]:
        """→ (templated text with image sentinels, decoded images)."""
        msg_dicts = []
        images: list = []
        for m in messages:
            content = m.content
            if isinstance(content, list):
                # OpenAI-style content parts (text + image_url)
                parts = []
                for p in content:
                    if not isinstance(p, dict):
                        continue
                    if p.get("type") == "text":
                        parts.append(p.get("text", ""))
                    elif p.get("type") == "image_url":
                        url = (p.get("image_url") or {}).get("url", "")
                        images.append(self._decode_image_url(url))
                        parts.append(self._MM_SENTINEL)
                content = "".join(parts)
            msg_dicts.append({"role": m.role, "content": content or ""})
        if getattr(self.tokenizer, "chat_template", None) or chat_template:
            text = self.tokenizer.apply_chat_template(
                msg_dicts, tokenize=False,
                chat_template=chat_template,
                add_generation_prompt=add_generation_prompt)
        else:
            # no template: simple role-tagged fallback
            text = "".join(f"{m['role']}: {m['content']}\n"
                           for m in msg_dicts)
            if add_generation_prompt:
                text += "assistant:"
        return text, images

    @staticmethod
    def _decode_image_url(url: str):
        """data: URLs only — the serving host has no egress and MUST
        not be made to fetch attacker-chosen URLs (SSRF)."""
        if not url.startswith("data:"):
            raise ValueError(
                "only data: image URLs are supported")
        import base64
        import io

        from PIL import Image

        _, b64 = url.split(",", 1)
        return Image.open(io.BytesIO(
            base64.b64decode(b64))).convert("RGB")

    def _build_mm_prompt(self, text: str, images: list):
        """Templated text + images → engine prompt dict: tokenize the
        text segments around each sentinel and splice the model's
        image token id between them."""
        if not images:
            return text
        if not self.config.model_config.is_multimodal:
            raise ValueError("image content given but the model is "
                             "text-only")
        image_token = self.config.model_config.image_token_index
        segments = text.split(self._MM_SENTINEL)
        token_ids: list[int] = []
        for i, seg_text in enumerate(segments):
            if seg_text:
                token_ids.extend(
                    self.tokenizer.encode(
                        seg_text, add_special_tokens=(i == 0)))
            if i < len(segments) - 1:
                token_ids.append(image_token)
        return {"prompt_token_ids": token_ids,
                "prompt": text.replace(self._MM_SENTINEL, ""),
                "multi_modal_data": {"image": images}}

    # ---- /v1/responses (reference: api_server.py:345-1240
    # create_responses / retrieve_responses / cancel_responses) ------

    def _responses_to_messages(self, body) -> list:
        """ResponsesRequest input → chat messages, replaying the
        previous_response_id conversation when chained."""
        messages: list[dict] = []
        if body.previous_response_id:
            prev = self._responses.get(body.previous_response_id)
            if prev is None:
                raise ValueError(
                    f"previous response "
                    f"{body.previous_response_id!r} not found")
            messages.extend(prev["_messages"])
        if body.instructions:
            messages.append({"role": "system",
                             "content": body.instructions})
        if isinstance(body.input, str):
            messages.append({"role": "user", "content": body.input})
        else:
            for item in body.input:
                if item.get("type", "message") != "message" and \
                        "role" not in item:
                    continue  # non-message items (tool outputs etc.)
                content = item.get("content")
                if isinstance(content, list):  # typed content parts
                    content = "".join(
                        p.get("text", "") for p in content
                        if isinstance(p, dict))
                messages.append({"role": item.get("role", "user"),
                                 "content": content or ""})
        return messages

    def _response_json(self, rec: dict) -> dict:
        return {k: v for k, v in rec.items()
                if not k.startswith("_")}

    async def _run_response(self, rec: dict, prompt, params,
                            request_id: str) -> None:
        try:
            final = None
            async for out in self.engine.generate(prompt, params,
                                                  request_id):
                final = out
            co = final.outputs[0]
            rec["status"] = "completed"
            rec["output"] = [{
                "type": "message",
                "id": f"msg_{random_uuid()}",
                "role": "assistant",
                "status": "completed",
                "content": [{"type": "output_text", "text": co.text,
                             "annotations": []}],
            }]
            rec["output_text"] = co.text
            rec["usage"] = {
                "input_tokens": len(final.prompt_token_ids),
                "output_tokens": len(co.token_ids),
                "total_tokens": len(final.prompt_token_ids) +
                len(co.token_ids),
            }
            rec["_messages"].append({"role": "assistant",
                                     "content": co.text})
        except asyncio.CancelledError:
            rec["status"] = "cancelled"
        except Exception as e:  # noqa: BLE001
            rec["status"] = "failed"
            rec["error"] = {"message": str(e)}

    async def responses(self, request: web.Request) -> web.Response:
        try:
            body = ResponsesRequest(**await request.json())
            messages = self._responses_to_messages(body)
            text, images = self._apply_chat_template(
                [ChatMessage(**m) for m in messages], True, None)
            prompt = self._build_mm_prompt(text, images)
            params = body.to_sampling_params(self.max_model_len)
        except ValueError as e:
            return error_json(400, str(e))
        response_id = f"resp_{random_uuid()}"
        request_id = response_id
        import time as _time

        rec = {
            "id": response_id,
            "object": "response",
            "created_at": int(_time.time()),
            "model": body.model or self.model_name,
            "status": "in_progress",
            "output": [],
            "output_text": None,
            "usage": None,
            "previous_response_id": body.previous_response_id,
            "instructions": body.instructions,
            "metadata": body.metadata or {},
            "_messages": messages,
        }
        if body.store or body.background:
            self._responses[response_id] = rec

        if body.stream and not body.background:
            return await self._stream_response(request, rec, prompt,
                                               params, request_id)
        task = asyncio.get_running_loop().create_task(
            self._run_response(rec, prompt, params, request_id))
        self._response_tasks[response_id] = task
        if body.background:
            return web.json_response(self._response_json(rec))
        await task
        self._response_tasks.pop(response_id, None)
        if rec["status"] == "failed":
            return error_json(500, rec["error"]["message"],
                              "InternalServerError")
        return web.json_response(self._response_json(rec))

    async def _stream_response(self, request, rec, prompt, params,
                               request_id) -> web.StreamResponse:
        """SSE: response.created / response.output_text.delta /
        response.completed events."""
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)

        async def emit(event: str, data: dict) -> None:
            await resp.write(
                f"event: {event}\ndata: {json.dumps(data)}\n\n"
                .encode())

        await emit("response.created",
                   {"type": "response.created",
                    "response": self._response_json(rec)})
        pieces: list[str] = []
        final = None
        try:
            async for out in self.engine.generate(prompt, params,
                                                  request_id):
                final = out
                delta = out.outputs[0].text
                if delta:
                    pieces.append(delta)
                    await emit("response.output_text.delta",
                               {"type": "response.output_text.delta",
                                "delta": delta})
        except (ValueError, EngineDeadError) as e:
            rec["status"] = "failed"
            await emit("response.failed",
                       {"type": "response.failed",
                        "error": {"message": str(e)}})
            await resp.write_eof()
            return resp
        text = "".join(pieces)
        rec["status"] = "completed"
        rec["output_text"] = text
        rec["output"] = [{
            "type": "message", "id": f"msg_{random_uuid()}",
            "role": "assistant", "status": "completed",
            "content": [{"type": "output_text", "text": text,
                         "annotations": []}],
        }]
        if final is not None:
            ntok = len(final.outputs[0].token_ids)
            rec["usage"] = {
                "input_tokens": len(final.prompt_token_ids),
                "output_tokens": ntok,
                "total_tokens": len(final.prompt_token_ids) + ntok,
            }
        rec["_messages"].append({"role": "assistant",
                                 "content": text})
        await emit("response.completed",
                   {"type": "response.completed",
                    "response": self._response_json(rec)})
        await resp.write_eof()
        return resp

    async def get_response(self, request: web.Request) -> web.Response:
        rec = self._responses.get(request.match_info["response_id"])
        if rec is None:
            return error_json(404, "response not found")
        return web.json_response(self._response_json(rec))

    async def cancel_response(self,
                              request: web.Request) -> web.Response:
        rid = request.match_info["response_id"]
        rec = self._responses.get(rid)
        if rec is None:
            return error_json(404, "response not found")
        task = self._response_tasks.pop(rid, None)
        if task is not None and not task.done():
            task.cancel()
            await self.engine.abort(rid)
            rec["status"] = "cancelled"
        return web.json_response(self._response_json(rec))

    async def chat_completions(self,
                               request: web.Request) -> web.Response:
        try:
            body = ChatCompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return error_json(400, f"invalid request: {e}")
        if not body.messages:
            return error_json(400, "messages must be non-empty")
        try:
            text, images = self._apply_chat_template(
                body.messages, body.add_generation_prompt,
                body.chat_template)
            prompt = self._build_mm_prompt(text, images)
            params = body.to_sampling_params(
                default_max_tokens=self.max_model_len)
            forced_tools = self._apply_tool_choice(body, params)
        except ValueError as e:
            return error_json(400, str(e))
        request_id = f"chatcmpl-{random_uuid()}"

        if body.stream:
            return await self._stream_chat(request, body, prompt,
                                           params, request_id,
                                           forced_tools=forced_tools)
        try:
            final = None
            async for out in self.engine.generate(prompt, params,
                                                  request_id):
                final = out
            assert final is not None
        except ValueError as e:
            return error_json(400, str(e))
        except EngineDeadError as e:
            return error_json(500, str(e), "InternalServerError")
        co = final.outputs[0]
        content = co.text
        finish_reason = co.finish_reason
        reasoning_content = None
        tool_calls = None
        if self.reasoning_parser is not None:
            ro = self.reasoning_parser.extract(content)
            reasoning_content = ro.reasoning_content
            content = ro.content or ""
        if forced_tools:
            # guided decoding already constrained the output to the
            # tool schema — parse it directly (reference:
            # tool_choice named/required via structured output)
            import json as _json

            from vllm_main_modify_tpu.entrypoints.openai \
                .tool_parsers import ToolCall

            try:
                obj = _json.loads(content)
                tool_calls = [
                    ToolCall(
                        name=obj.get("name", ""),
                        arguments=_json.dumps(
                            obj.get("parameters",
                                    obj.get("arguments", {})))
                    ).to_openai()
                ]
                content = None
                finish_reason = "tool_calls"
            except _json.JSONDecodeError:
                pass
        elif self.tool_parser is not None and body.tools:
            extracted = self.tool_parser.extract(content)
            if extracted.tools_called:
                tool_calls = [c.to_openai()
                              for c in extracted.tool_calls]
                content = extracted.content
                finish_reason = "tool_calls"
        message = ChatMessage(role="assistant", content=content,
                              tool_calls=tool_calls)
        if reasoning_content is not None:
            message.reasoning_content = reasoning_content
        resp = ChatCompletionResponse(
            id=request_id, model=body.model or self.model_name,
            choices=[
                ChatCompletionChoice(
                    index=0,
                    message=message,
                    finish_reason=finish_reason,
                    logprobs=self._fmt_chat_logprobs(co))
            ],
            usage=UsageInfo(
                prompt_tokens=len(final.prompt_token_ids),
                completion_tokens=len(co.token_ids),
                total_tokens=len(final.prompt_token_ids) +
                len(co.token_ids)))
        return web.json_response(resp.model_dump())

    @staticmethod
    def _apply_tool_choice(body, params) -> bool:
        """tool_choice "required" / named function → guided JSON over
        the tool schemas (reference: serving_chat.py tool_choice
        structured-output forcing). Returns True when forced."""
        tc = body.tool_choice
        if not body.tools or tc in (None, "none", "auto"):
            return False
        if params.structured_outputs is not None:
            raise ValueError("tool_choice forcing cannot combine "
                             "with an explicit structured output")

        def one(tool: dict) -> dict:
            fn = tool.get("function", tool)
            return {
                "type": "object",
                "properties": {
                    "name": {"const": fn.get("name", "")},
                    "parameters": fn.get("parameters",
                                         {"type": "object"}),
                },
                "required": ["name", "parameters"],
            }

        if isinstance(tc, dict):
            name = tc.get("function", {}).get("name")
            match = [t for t in body.tools
                     if t.get("function", t).get("name") == name]
            if not match:
                raise ValueError(f"tool_choice names unknown "
                                 f"function {name!r}")
            schema = one(match[0])
        elif tc == "required":
            schema = {"anyOf": [one(t) for t in body.tools]}
        else:
            raise ValueError(f"unsupported tool_choice {tc!r}")
        from vllm_main_modify_tpu.sampling_params import \
            StructuredOutputParams

        params.structured_outputs = StructuredOutputParams(
            json_schema=schema)
        return True

    async def _stream_chat(self, request, body, prompt, params,
                           request_id,
                           forced_tools: bool = False
                           ) -> web.StreamResponse:
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)
        first = ChatCompletionStreamResponse(
            id=request_id, model=body.model or self.model_name,
            choices=[
                ChatCompletionStreamChoice(
                    index=0, delta=DeltaMessage(role="assistant",
                                                content=""))
            ])
        await resp.write(
            f"data: {json.dumps(first.model_dump(exclude_none=True))}"
            "\n\n".encode())

        # incremental extraction state (reference:
        # extract_tool_calls_streaming, serving_chat.py SSE path):
        # tool-call/reasoning deltas stream structured; raw marker
        # text never reaches the client
        extractor = None
        tool_parser = (self.tool_parser
                       if (body.tools and not forced_tools) else None)
        if tool_parser is not None or \
                self.reasoning_parser is not None:
            from vllm_main_modify_tpu.entrypoints.openai \
                .tool_parsers import StreamingExtractor

            extractor = StreamingExtractor(tool_parser,
                                           self.reasoning_parser)
        forced_text = []

        async def write_delta(fields: dict, finish=None):
            chunk = ChatCompletionStreamResponse(
                id=request_id, model=body.model or self.model_name,
                choices=[
                    ChatCompletionStreamChoice(
                        index=0, delta=DeltaMessage(**fields),
                        finish_reason=finish)
                ])
            await resp.write(
                f"data: "
                f"{json.dumps(chunk.model_dump(exclude_none=True))}"
                "\n\n".encode())

        try:
            async for out in self.engine.generate(prompt, params,
                                                  request_id):
                co = out.outputs[0]
                finish = co.finish_reason
                if forced_tools:
                    # guided decoding constrained the whole output to
                    # the tool schema: buffer, emit one call at end
                    forced_text.append(co.text)
                    if finish is None:
                        continue
                    fields = self._parse_forced_tool(
                        "".join(forced_text))
                    if fields is not None:
                        await write_delta(fields, "tool_calls")
                    else:
                        await write_delta(
                            {"content": "".join(forced_text)}, finish)
                    continue
                if extractor is None:
                    if co.text or finish is not None:
                        await write_delta({"content": co.text},
                                          finish)
                    continue
                deltas = extractor.push(co.text)
                if finish is not None:
                    deltas += extractor.finish()
                    if extractor.tools_called:
                        finish = "tool_calls"
                if not deltas and finish is not None:
                    deltas = [{"content": ""}]
                for i, fields in enumerate(deltas):
                    last = i == len(deltas) - 1
                    await write_delta(
                        fields, finish if last else None)
        except (ValueError, EngineDeadError) as e:
            err = {"error": {"message": str(e)}}
            await resp.write(f"data: {json.dumps(err)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    @staticmethod
    def _parse_forced_tool(text: str) -> Optional[dict]:
        """Parse a guided-decoding tool JSON into a tool_calls delta
        (None if it does not parse)."""
        from vllm_main_modify_tpu.entrypoints.openai.tool_parsers \
            import ToolCall

        try:
            obj = json.loads(text)
        except json.JSONDecodeError:
            return None
        call = ToolCall(
            name=obj.get("name", ""),
            arguments=json.dumps(
                obj.get("parameters", obj.get("arguments", {}))))
        oc = call.to_openai()
        oc["index"] = 0
        return {"tool_calls": [oc]}

    # ---- logprob formatting ------------------------------------------

    @staticmethod
    def _fmt_completion_logprobs(co) -> Optional[dict]:
        if co.logprobs is None:
            return None
        token_logprobs, tokens, top = [], [], []
        for pos in co.logprobs:
            entries = sorted(pos.items(), key=lambda kv: kv[1].rank or 0)
            sampled_tid, sampled_lp = entries[0]
            tokens.append(sampled_lp.decoded_token or "")
            token_logprobs.append(sampled_lp.logprob)
            top.append({
                lp.decoded_token or str(tid): lp.logprob
                for tid, lp in pos.items()
            })
        return {"tokens": tokens, "token_logprobs": token_logprobs,
                "top_logprobs": top, "text_offset": []}

    @staticmethod
    def _fmt_chat_logprobs(co) -> Optional[dict]:
        if co.logprobs is None:
            return None
        content = []
        for pos in co.logprobs:
            entries = sorted(pos.items(), key=lambda kv: kv[1].rank or 0)
            sampled_tid, sampled_lp = entries[0]
            content.append({
                "token": sampled_lp.decoded_token or "",
                "logprob": sampled_lp.logprob,
                "top_logprobs": [{
                    "token": lp.decoded_token or "",
                    "logprob": lp.logprob,
                } for _, lp in entries],
            })
        return {"content": content}


async def run_server(engine: AsyncLLM, host: str = "0.0.0.0",
                     port: int = 8000,
                     served_model_name: Optional[str] = None,
                     tool_call_parser: Optional[str] = None,
                     reasoning_parser: Optional[str] = None,
                     reuse_port: bool = False) -> None:
    server = OpenAIServer(
        engine, served_model_name or engine.config.model_config.model,
        tool_call_parser=tool_call_parser,
        reasoning_parser=reasoning_parser)
    app = server.build_app()
    runner = web.AppRunner(app)
    await runner.setup()
    # reuse_port: multi-API-server scale-out — N frontend processes
    # bind the SAME port; the kernel load-balances connections
    # (reference: vllm serve --api-server-count)
    site = web.TCPSite(runner, host, port, reuse_port=reuse_port)
    await site.start()
    logger.info("OpenAI-compatible server listening on %s:%d", host,
                port)
    while True:
        await asyncio.sleep(3600)
