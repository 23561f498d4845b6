from vllm_main_modify_tpu.structured_output.manager import \
    StructuredOutputManager

__all__ = ["StructuredOutputManager"]
