"""TPU-native LLM inference and serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference vLLM checkout (see /root/repo/SURVEY.md): continuous batching,
paged KV cache with prefix caching, chunked prefill, quantized serving,
OpenAI-compatible API — built single-controller over a GSPMD device
mesh instead of rank-per-process NCCL workers.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import vllm_main_modify_tpu` light (no jax init).
    if name == "LLM":
        from vllm_main_modify_tpu.entrypoints.llm import LLM

        return LLM
    if name == "SamplingParams":
        from vllm_main_modify_tpu.sampling_params import SamplingParams

        return SamplingParams
    if name == "EngineConfig":
        from vllm_main_modify_tpu.config import EngineConfig

        return EngineConfig
    raise AttributeError(name)


__all__ = ["LLM", "SamplingParams", "EngineConfig", "__version__"]
