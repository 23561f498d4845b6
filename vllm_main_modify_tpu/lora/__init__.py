from vllm_main_modify_tpu.lora.request import LoRARequest

__all__ = ["LoRARequest"]
