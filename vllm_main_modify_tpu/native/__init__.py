"""Host-side native (C++) components — see build.py for the story."""

from vllm_main_modify_tpu.native.build import load_native

__all__ = ["load_native"]
