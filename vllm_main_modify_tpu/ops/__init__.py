"""Device op registry: every hot op has an XLA reference implementation
(used on CPU and as the correctness oracle) and, where it matters, a
Pallas TPU kernel. This module is the single dispatch point — the
TPU-native analogue of the reference's ``vllm/_custom_ops.py`` +
``csrc/torch_bindings.cpp`` (~95 CUDA op registrations collapse into a
handful of Pallas/XLA callables here).
"""

from vllm_main_modify_tpu.ops.kv_cache import write_to_kv_cache
from vllm_main_modify_tpu.ops.attention import ragged_paged_attention

__all__ = ["write_to_kv_cache", "ragged_paged_attention"]
