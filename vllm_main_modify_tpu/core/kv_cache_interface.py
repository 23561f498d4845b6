"""KV-cache group specs for hybrid-attention models.

Reference capability: vllm/v1/kv_cache_interface.py (FullAttentionSpec
:143, SlidingWindowSpec :215, MambaSpec :280) + kv_cache_coordinator.py.
Layers with the same allocation behavior form a *group*; each group
gets its own device array and its own page pool, so sliding-window
layers only hold window-sized KV and Mamba layers hold one fixed-size
state slot per request instead of a token-proportional page chain.

TPU-native shape: group g's cache is one stacked array
``[L_g, P_g, page, 2*Hk*D]`` (or fixed state arrays for Mamba), sized
independently — the memory win comes from P_window << P_full at long
context, not from virtual-block bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from vllm_main_modify_tpu.utils import cdiv


@dataclass(frozen=True)
class KVCacheGroupSpec:
    """One allocation group: which model layers it covers and how its
    per-request memory grows."""

    kind: str  # "full" | "window" | "mamba"
    layer_ids: tuple[int, ...]  # model layer indices in this group
    kv_heads: int = 0
    head_dim: int = 0
    # kind == "window": attention window in tokens
    window: int = 0
    # kind == "mamba": per-slot state (shape, dtype-name) list, e.g.
    # [((d_conv-1, d_inner), "float32"), ((heads, dstate, hd), "f32")]
    state_shapes: tuple = ()

    @property
    def num_layers(self) -> int:
        return len(self.layer_ids)

    def page_bytes(self, page_size: int, kv_dtype_size: int) -> int:
        """Device bytes of ONE page/slot of this group (all its
        layers)."""
        if self.kind == "mamba":
            import numpy as np

            total = 0
            for shape, dtype in self.state_shapes:
                n = 1
                for d in shape:
                    n *= d
                total += n * np.dtype(dtype).itemsize
            return total * self.num_layers
        return (self.num_layers * page_size * 2 * self.kv_heads *
                self.head_dim * kv_dtype_size)

    def max_pages_per_req(self, page_size: int, max_model_len: int,
                          num_lookahead: int = 0) -> int:
        """Upper bound on pages one request can hold at once — the
        basis for sizing bounded (window / mamba) pools."""
        if self.kind == "mamba":
            return 1
        if self.kind == "window":
            # a window straddles at most cdiv(window, page)+1 pages,
            # +1 for the page being written
            return min(cdiv(self.window + num_lookahead, page_size) + 2,
                       cdiv(max_model_len, page_size))
        return cdiv(max_model_len, page_size)


def single_full_group(kv_heads: int, head_dim: int,
                      num_layers: int) -> list[KVCacheGroupSpec]:
    return [
        KVCacheGroupSpec(kind="full",
                         layer_ids=tuple(range(num_layers)),
                         kv_heads=kv_heads,
                         head_dim=head_dim)
    ]


def normalize_kv_groups(model, enable_hybrid: bool = True
                        ) -> list[KVCacheGroupSpec]:
    """The runner/engine entry point: a model may expose
    ``kv_cache_groups()``; otherwise (or when hybrid management is
    disabled) everything collapses to one full-attention group via
    ``kv_cache_spec()``."""
    if hasattr(model, "kv_cache_groups"):
        groups = model.kv_cache_groups()
        if groups and (len(groups) > 1 or groups[0].kind != "full"):
            if enable_hybrid or any(g.kind == "mamba" for g in groups):
                # mamba state groups have no single-group fallback
                return list(groups)
    kv_heads, head_dim, num_layers = model.kv_cache_spec()
    return single_full_group(kv_heads, head_dim, num_layers)
