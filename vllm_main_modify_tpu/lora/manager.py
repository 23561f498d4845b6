"""LoRA adapter loading + LRU slot management.

Reference: vllm/lora/models.py ``LoRAModelManager`` (LRU adapter
slots) + worker mixin vllm/v1/worker/lora_model_runner_mixin.py.
TPU-native: adapters live STACKED on device — one [S, H, r] / [S, r, O]
pair per target module per layer, slot 0 reserved as the zero (null)
adapter — so the jitted step never recompiles when adapters load or
swap; loading an adapter is a slot-slice device update.

Adapter format: standard peft checkpoints (adapter_config.json with
r / lora_alpha / target_modules; adapter_model.safetensors with
``...layers.{i}.self_attn.q_proj.lora_A.weight`` [r, in] and
``lora_B.weight`` [out, r]).
"""

from __future__ import annotations

import json
import logging
import os
from collections import OrderedDict
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

# module-name → (param prefix, out-dim attr) handled per family
TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
           "up_proj", "down_proj")


class LoRAAdapter:
    """Host-side parsed adapter: per-layer per-target (A, B)."""

    def __init__(self, name: str, rank: int, alpha: float,
                 weights: dict[tuple[int, str],
                               tuple[np.ndarray, np.ndarray]]) -> None:
        self.name = name
        self.rank = rank
        self.alpha = alpha
        self.scaling = alpha / rank
        self.weights = weights  # (layer, target) -> (A [in,r], B [r,out])

    @classmethod
    def load(cls, name: str, path: str) -> "LoRAAdapter":
        with open(os.path.join(path, "adapter_config.json")) as f:
            cfg = json.load(f)
        rank = cfg["r"]
        alpha = cfg.get("lora_alpha", rank)
        from safetensors import safe_open

        st_path = os.path.join(path, "adapter_model.safetensors")
        weights: dict = {}
        with safe_open(st_path, framework="numpy") as f:
            names = list(f.keys())
            for key in names:
                if not key.endswith(".lora_A.weight"):
                    continue
                b_key = key.replace(".lora_A.", ".lora_B.")
                parts = key.split(".")
                layer = int(parts[parts.index("layers") + 1])
                target = parts[-3]
                a = f.get_tensor(key)  # [r, in] (torch layout)
                b = f.get_tensor(b_key)  # [out, r]
                weights[(layer, target)] = (
                    np.ascontiguousarray(a.T.astype(np.float32)),
                    np.ascontiguousarray(b.T.astype(np.float32)))
        return cls(name, rank, alpha, weights)


class LoRAManager:
    """Slot allocator over the stacked device tensors. Slot 0 = null
    adapter; slots 1..max_loras LRU-assigned by adapter name."""

    def __init__(self, max_loras: int, max_rank: int,
                 num_layers: int) -> None:
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.num_layers = num_layers
        self.num_slots = max_loras + 1
        # name -> slot; insertion order = LRU
        self._slots: "OrderedDict[str, int]" = OrderedDict()
        self._paths: dict[str, str] = {}
        # host mirrors of the per-slot scaling
        self.scales = np.zeros(self.num_slots, dtype=np.float32)

    def register(self, name: str, path: str) -> None:
        self._paths[name] = path

    def slot_of(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        slot = self._slots.get(name)
        if slot is not None:
            self._slots.move_to_end(name)
            return slot
        raise KeyError(f"LoRA adapter {name!r} not activated")

    def activate(self, name: str, sites: dict[str, list],
                 update_fn) -> int:
        """Ensure `name` occupies a slot; loads + writes the device
        stacks via ``update_fn(path, slot, a_stack, b_stack)`` on
        miss. ``sites``: target tail -> [(tree path, num_layers,
        layer_offset)] from the runner's param-spec scan — a checkpoint
        target maps onto every tree site with the same module tail.
        Returns the slot."""
        if name in self._slots:
            self._slots.move_to_end(name)
            return self._slots[name]
        if name not in self._paths:
            raise KeyError(f"LoRA adapter {name!r} is not registered")
        if len(self._slots) >= self.max_loras:
            evicted, slot = self._slots.popitem(last=False)
            logger.info("evicting LoRA %r from slot %d", evicted, slot)
        else:
            slot = len(self._slots) + 1
        adapter = LoRAAdapter.load(name, self._paths[name])
        if adapter.rank > self.max_rank:
            raise ValueError(
                f"adapter rank {adapter.rank} > max_lora_rank "
                f"{self.max_rank}")
        targets = {t for (_, t) in adapter.weights}
        for target in targets:
            for path, num_l, layer_off in sites.get(target, ()):
                a_stack = b_stack = None
                for layer in range(num_l):
                    w = adapter.weights.get(
                        (layer + layer_off, target))
                    if w is None:
                        continue
                    a, b = w
                    if a_stack is None:
                        a_stack = np.zeros(
                            (num_l, a.shape[0], self.max_rank),
                            dtype=np.float32)
                        b_stack = np.zeros(
                            (num_l, self.max_rank, b.shape[1]),
                            dtype=np.float32)
                    a_stack[layer, :, :adapter.rank] = a
                    b_stack[layer, :adapter.rank, :] = b
                if a_stack is not None:
                    update_fn(path, slot, a_stack, b_stack)
        self.scales[slot] = adapter.scaling
        self._slots[name] = slot
        return slot

    def list_adapters(self) -> dict[str, int]:
        return dict(self._slots)
