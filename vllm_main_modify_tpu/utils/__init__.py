"""Small shared utilities.

TPU-native reimagining of the reference's ``vllm/utils/`` grab bag
(reference: vllm/utils/__init__.py). Only what the new framework actually
needs lives here.
"""

from __future__ import annotations

import math
import os
import time
from typing import Iterable, Sequence


def cdiv(a: int, b: int) -> int:
    """Ceiling division (reference: vllm/utils/math_utils.py cdiv)."""
    return -(-a // b)


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def round_down(x: int, multiple: int) -> int:
    return (x // multiple) * multiple


def next_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def prev_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n.bit_length() - 1)


class Counter:
    """Monotonic id generator (reference: vllm/utils/__init__.py Counter)."""

    def __init__(self, start: int = 0) -> None:
        self._value = start

    def __next__(self) -> int:
        v = self._value
        self._value += 1
        return v

    def reset(self) -> None:
        self._value = 0


def env_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")


def env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return default if v is None else int(v)


def env_str(name: str, default: str | None = None) -> str | None:
    return os.environ.get(name, default)


class StopWatch:
    """Monotonic timer for host-side latency accounting."""

    def __init__(self) -> None:
        self.start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.start

    def lap(self) -> float:
        now = time.perf_counter()
        out = now - self.start
        self.start = now
        return out


def swap_dict_values(d: dict, k1, k2) -> None:
    """Swap (or move) values between two keys; missing keys delete the other.

    Reference: vllm/utils/collection_utils.py swap_dict_values.
    """
    v1 = d.get(k1)
    v2 = d.get(k2)
    if v2 is not None:
        d[k1] = v2
    else:
        d.pop(k1, None)
    if v1 is not None:
        d[k2] = v1
    else:
        d.pop(k2, None)


def flatten_2d(lists: Iterable[Sequence]) -> list:
    return [x for sub in lists for x in sub]


def sha256_int(data: bytes) -> int:
    import hashlib

    return int.from_bytes(hashlib.sha256(data).digest()[:8], "little")


def get_dtype_size(dtype) -> int:
    """Bytes per element for a jnp/np dtype."""
    import numpy as np

    try:
        return np.dtype(dtype).itemsize
    except TypeError:
        # jax extended dtypes (e.g. float8) expose itemsize via dtype
        import jax.numpy as jnp

        return jnp.dtype(dtype).itemsize


GiB = 1 << 30
MiB = 1 << 20
