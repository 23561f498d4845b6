"""Central environment-flag registry (reference: vllm/envs.py — 636
lazy, documented flags; this framework keeps a deliberately small
surface, every flag below is read lazily at use time).

Usage::

    from vllm_main_modify_tpu import envs
    if envs.VLLM_SERVER_DEV_MODE: ...

Values are re-read from ``os.environ`` on every attribute access (like
the reference's lambda table) so tests can monkeypatch the
environment without import-order games.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional


def _flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")


def _int(name: str, default: Optional[int]) -> Optional[int]:
    v = os.environ.get(name)
    return default if v in (None, "") else int(v)


def _str(name: str, default: Optional[str] = None) -> Optional[str]:
    return os.environ.get(name, default)


# name -> (reader, doc). Docs double as the docs/envs table source.
ENVIRONMENT_VARIABLES: dict[str, tuple[Callable[[], Any], str]] = {
    # --- serving / engine ------------------------------------------------
    "VLLM_SERVER_DEV_MODE": (
        lambda: _flag("VLLM_SERVER_DEV_MODE"),
        "Expose development-only HTTP routes (/reset_prefix_cache, "
        "/sleep, /wake_up, /collective_rpc...) on the OpenAI server "
        "(reference: envs.py VLLM_SERVER_DEV_MODE)."),
    "VLLM_DISABLE_NATIVE": (
        lambda: _flag("VLLM_DISABLE_NATIVE"),
        "Force pure-Python fallbacks for native (C) components — "
        "currently the ngram proposer (spec_decode/native)."),
    # --- TPU kernel tuning ----------------------------------------------
    "VLLM_TPU_DECODE_PACK": (
        lambda: _int("VLLM_TPU_DECODE_PACK", None),
        "Lane-pack factor for the decode attention kernel on "
        "narrow-KV models (0 disables, default auto: pack "
        "1024//(2*Hk*D) sequences side-by-side per stream block)."),
    "VLLM_TPU_DECODE_KV_BLOCK": (
        lambda: _int("VLLM_TPU_DECODE_KV_BLOCK", None),
        "Decode-attention KV stream block in tokens (default 128; "
        "multiples of the page size). Workload tuning knob for "
        "ops/pallas/ragged_attn.py."),
    "VLLM_TPU_PREFILL_KV_BLOCK": (
        lambda: _int("VLLM_TPU_PREFILL_KV_BLOCK", None),
        "Prefill-attention KV stream block in tokens (default from "
        "the VMEM budget, 128-512)."),
    "VLLM_TPU_PREFILL_BQ": (
        lambda: _int("VLLM_TPU_PREFILL_BQ", 1024),
        "Prefill-attention q rows per grid step before dividing by "
        "the GQA group ratio (clamped to [16, 128])."),
    "VLLM_TPU_BUCKET_PADDING_GAP": (
        lambda: _int("VLLM_TPU_BUCKET_PADDING_GAP", 0),
        "Switch token-count buckets from power-of-2 to linear gaps "
        "of this size above the first gap boundary (reference: "
        "envs.py VLLM_TPU_BUCKET_PADDING_GAP)."),
    # --- structured-output audit (fork delta) ---------------------------
    "VLLM_STRUCTURED_OUTPUT_AUDIT": (
        lambda: _flag("VLLM_STRUCTURED_OUTPUT_AUDIT"),
        "Enable the structured-output audit tracker (reference fork: "
        "audit_integration.py:52-61)."),
    "VLLM_AUDIT_RECORD_FULL_EVENTS": (
        lambda: _flag("VLLM_AUDIT_RECORD_FULL_EVENTS", True),
        "Record every token accept/reject event (not just summary "
        "counters) in audit trails."),
    "VLLM_AUDIT_INCLUDE_GRAMMAR": (
        lambda: _flag("VLLM_AUDIT_INCLUDE_GRAMMAR"),
        "Embed the full grammar spec in each audit trail."),
    "VLLM_AUDIT_MAX_TRAILS": (
        lambda: _int("VLLM_AUDIT_MAX_TRAILS", 1000),
        "In-memory audit-trail ring capacity."),
    "VLLM_AUDIT_PERSIST": (
        lambda: _flag("VLLM_AUDIT_PERSIST"),
        "Persist finished audit trails as JSONL."),
    "VLLM_AUDIT_LOG_DIR": (
        lambda: _str("VLLM_AUDIT_LOG_DIR"),
        "Directory for persisted audit JSONL files."),
    "VLLM_AUDIT_IN_RESPONSE": (
        lambda: _flag("VLLM_AUDIT_IN_RESPONSE", True),
        "Attach the audit summary to API responses."),
}


def __getattr__(name: str):
    try:
        reader, _ = ENVIRONMENT_VARIABLES[name]
    except KeyError:
        raise AttributeError(name) from None
    return reader()


def __dir__():
    return sorted(ENVIRONMENT_VARIABLES)
