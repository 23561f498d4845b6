"""Tiny native-extension builder: g++ → cached .so → ctypes.

Reference counterpart: csrc/ + torch_bindings.cpp built via CMake
(csrc/CMakeLists.txt). Device compute here is Pallas/XLA, so the only
native code this framework needs is **host-side** hot loops (ngram
draft matching, etc.). Those are compiled on first use with the
system toolchain and cached next to the source — no pip, no cmake, no
pybind dependency (plain ``extern "C"`` + ctypes).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LOCK = threading.Lock()
_LOADED: dict[str, ctypes.CDLL] = {}


def _source_digest(src_path: str) -> str:
    with open(src_path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Compile ``<name>.cpp`` (next to this file) into a cached shared
    object and dlopen it. Returns None if no toolchain is available —
    callers keep a pure-Python fallback."""
    with _LOCK:
        if name in _LOADED:
            return _LOADED[name]
        src = os.path.join(os.path.dirname(__file__), f"{name}.cpp")
        if not os.path.exists(src):
            return None
        digest = _source_digest(src)
        so_path = os.path.join(_CACHE_DIR, f"{name}-{digest}.so")
        if not os.path.exists(so_path):
            os.makedirs(_CACHE_DIR, exist_ok=True)
            tmp = so_path + f".tmp{os.getpid()}"
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src, "-o", tmp]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (subprocess.SubprocessError, FileNotFoundError,
                    OSError):
                return None
            os.replace(tmp, so_path)
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        _LOADED[name] = lib
        return lib
