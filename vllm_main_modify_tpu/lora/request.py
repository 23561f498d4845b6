"""LoRA request record (reference: vllm/lora/request.py)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LoRARequest:
    lora_name: str
    lora_path: str
    lora_int_id: int = 0
