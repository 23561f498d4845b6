"""Structured-output audit tracking (the fork's signature subsystem).

Reference parity: vllm/v1/structured_output/audit_tracker.py
(``StructuredOutputAuditTracker`` :165, ``AuditTrail`` :108, event
types :31-42) + audit_integration.py env configuration (:52-61).
Capabilities preserved: env-gated per-request audit trails of every
grammar decision, bounded in-memory ring, optional JSONL persistence,
response enrichment data, and the admin HTTP API (audit_admin.py).
"""

from __future__ import annotations

import enum
import json
import logging
import os
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Optional

logger = logging.getLogger(__name__)


class AuditEventType(enum.Enum):
    STATE_INIT = "state_init"
    TOKEN_ACCEPT = "token_accept"
    TOKEN_REJECT = "token_reject"
    TOKEN_VALIDATE = "token_validate"
    STATE_TRANSITION = "state_transition"
    BITMASK_UPDATE = "bitmask_update"
    ROLLBACK = "rollback"
    TERMINATION = "termination"
    ERROR = "error"


@dataclass
class AuditEvent:
    event_type: AuditEventType
    timestamp: float = field(default_factory=time.time)
    token_id: Optional[int] = None
    accepted: Optional[bool] = None
    fsm_state: Optional[int] = None
    num_allowed_tokens: Optional[int] = None
    detail: Optional[dict] = None

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {
            "event_type": self.event_type.value,
            "timestamp": self.timestamp,
        }
        for k in ("token_id", "accepted", "fsm_state",
                  "num_allowed_tokens", "detail"):
            v = getattr(self, k)
            if v is not None:
                d[k] = v
        return d


@dataclass
class AuditTrail:
    request_id: str
    backend_type: str = "regex_dfa"
    grammar_spec: Optional[str] = None
    start_time: float = field(default_factory=time.time)
    end_time: Optional[float] = None
    events: list[AuditEvent] = field(default_factory=list)
    accepted_tokens: list[int] = field(default_factory=list)
    rejected_tokens: list[int] = field(default_factory=list)
    num_rollbacks: int = 0
    num_errors: int = 0
    terminated_ok: Optional[bool] = None

    def add_event(self, event: AuditEvent,
                  record_full: bool = True) -> None:
        if record_full:
            self.events.append(event)
        if event.event_type == AuditEventType.TOKEN_ACCEPT:
            self.accepted_tokens.append(event.token_id)
        elif event.event_type == AuditEventType.TOKEN_REJECT:
            self.rejected_tokens.append(event.token_id)
        elif event.event_type == AuditEventType.ROLLBACK:
            self.num_rollbacks += 1
        elif event.event_type == AuditEventType.ERROR:
            self.num_errors += 1

    def finalize(self) -> None:
        self.end_time = time.time()

    def to_dict(self, include_events: bool = True) -> dict[str, Any]:
        d = {
            "request_id": self.request_id,
            "backend_type": self.backend_type,
            "start_time": self.start_time,
            "end_time": self.end_time,
            "num_events": len(self.events),
            "num_accepted_tokens": len(self.accepted_tokens),
            "num_rejected_tokens": len(self.rejected_tokens),
            "num_rollbacks": self.num_rollbacks,
            "num_errors": self.num_errors,
            "terminated_ok": self.terminated_ok,
        }
        if self.grammar_spec is not None:
            d["grammar_spec"] = self.grammar_spec
        if include_events:
            d["events"] = [e.to_dict() for e in self.events]
        return d

    def summary(self) -> dict[str, Any]:
        return self.to_dict(include_events=False)


class StructuredOutputAuditTracker:
    """Bounded ring of per-request trails, thread-safe, optional JSONL
    persistence (one record per event plus start/end markers)."""

    def __init__(self, enabled: bool = False,
                 max_trails_in_memory: int = 1000,
                 record_full_events: bool = True,
                 include_grammar_spec: bool = False,
                 persist_to_disk: bool = False,
                 audit_log_dir: Optional[str] = None,
                 include_in_response: bool = True) -> None:
        self.enabled = enabled
        self.max_trails = max_trails_in_memory
        self.record_full_events = record_full_events
        self.include_grammar_spec = include_grammar_spec
        self.persist_to_disk = persist_to_disk
        self.audit_log_dir = audit_log_dir
        self.include_in_response = include_in_response
        self._trails: "OrderedDict[str, AuditTrail]" = OrderedDict()
        self._lock = threading.Lock()
        self._log_file = None
        if persist_to_disk and audit_log_dir:
            os.makedirs(audit_log_dir, exist_ok=True)
            path = os.path.join(audit_log_dir,
                                f"audit-{int(time.time())}.jsonl")
            self._log_file = open(path, "a")

    # ------------------------------------------------------------------

    def is_enabled(self) -> bool:
        return self.enabled

    def set_enabled(self, enabled: bool) -> None:
        self.enabled = enabled

    def _persist(self, record_type: str, payload: dict) -> None:
        if self._log_file is None:
            return
        try:
            rec = {"record_type": record_type, "ts": time.time(),
                   **payload}
            self._log_file.write(json.dumps(rec) + "\n")
            self._log_file.flush()
        except OSError:
            logger.exception("audit persistence failed")

    def start_trail(self, request_id: str, backend_type: str,
                    grammar_spec: Optional[str] = None) -> None:
        if not self.enabled:
            return
        with self._lock:
            trail = AuditTrail(
                request_id=request_id, backend_type=backend_type,
                grammar_spec=(grammar_spec
                              if self.include_grammar_spec else None))
            self._trails[request_id] = trail
            while len(self._trails) > self.max_trails:
                self._trails.popitem(last=False)
        self._persist("trail_start", {
            "request_id": request_id, "backend_type": backend_type,
            "start_time": trail.start_time,
            "grammar_spec": trail.grammar_spec,
        })

    def _record(self, request_id: str, event: AuditEvent) -> None:
        if not self.enabled:
            return
        with self._lock:
            trail = self._trails.get(request_id)
            if trail is None:
                return
            trail.add_event(event, self.record_full_events)
        self._persist("event", {"request_id": request_id,
                                "event": event.to_dict()})

    # convenience recorders used by Grammar/manager ---------------------

    def record_token(self, request_id: str, token_id: int,
                     accepted: bool, fsm_state: int) -> None:
        self._record(
            request_id,
            AuditEvent(event_type=(AuditEventType.TOKEN_ACCEPT
                                   if accepted else
                                   AuditEventType.TOKEN_REJECT),
                       token_id=token_id, accepted=accepted,
                       fsm_state=fsm_state))

    def record_bitmask(self, request_id: str, fsm_state: int,
                       words) -> None:
        if not self.enabled:
            return
        num_allowed = int(
            bin(int.from_bytes(words.tobytes(), "little")).count("1"))
        self._record(
            request_id,
            AuditEvent(event_type=AuditEventType.BITMASK_UPDATE,
                       fsm_state=fsm_state,
                       num_allowed_tokens=num_allowed))

    def record_rollback(self, request_id: str,
                        num_tokens: int) -> None:
        self._record(
            request_id,
            AuditEvent(event_type=AuditEventType.ROLLBACK,
                       detail={"num_tokens": num_tokens}))

    def record_termination(self, request_id: str, ok: bool) -> None:
        self._record(
            request_id,
            AuditEvent(event_type=AuditEventType.TERMINATION,
                       accepted=ok))
        with self._lock:
            trail = self._trails.get(request_id)
            if trail is not None:
                trail.terminated_ok = ok

    def record_error(self, request_id: str, message: str) -> None:
        self._record(
            request_id,
            AuditEvent(event_type=AuditEventType.ERROR,
                       detail={"message": message}))

    def finalize_trail(self, request_id: str) -> None:
        if not self.enabled:
            return
        with self._lock:
            trail = self._trails.get(request_id)
            if trail is None or trail.end_time is not None:
                return
            trail.finalize()
        self._persist("trail_end",
                      {"request_id": request_id,
                       "summary": trail.summary()})

    # queries -----------------------------------------------------------

    def get_trail(self, request_id: str) -> Optional[AuditTrail]:
        with self._lock:
            return self._trails.get(request_id)

    def get_all_trails(self) -> dict[str, AuditTrail]:
        with self._lock:
            return dict(self._trails)

    def remove_trail(self, request_id: str) -> bool:
        with self._lock:
            return self._trails.pop(request_id, None) is not None

    def clear(self) -> int:
        with self._lock:
            n = len(self._trails)
            self._trails.clear()
            return n

    def stats(self) -> dict[str, Any]:
        with self._lock:
            trails = list(self._trails.values())
        acc = sum(len(t.accepted_tokens) for t in trails)
        rej = sum(len(t.rejected_tokens) for t in trails)
        return {
            "enabled": self.enabled,
            "num_trails": len(trails),
            "active_trails": sum(1 for t in trails
                                 if t.end_time is None),
            "total_accepted_tokens": acc,
            "total_rejected_tokens": rej,
            "total_rollbacks": sum(t.num_rollbacks for t in trails),
            "total_errors": sum(t.num_errors for t in trails),
            "persist_to_disk": self.persist_to_disk,
            "audit_log_dir": self.audit_log_dir,
        }


_TRACKER: Optional[StructuredOutputAuditTracker] = None


def get_audit_tracker() -> StructuredOutputAuditTracker:
    """Global tracker configured from env (reference:
    audit_integration.py:52-61)."""
    global _TRACKER
    if _TRACKER is None:
        from vllm_main_modify_tpu import envs

        _TRACKER = StructuredOutputAuditTracker(
            enabled=envs.VLLM_STRUCTURED_OUTPUT_AUDIT,
            record_full_events=envs.VLLM_AUDIT_RECORD_FULL_EVENTS,
            include_grammar_spec=envs.VLLM_AUDIT_INCLUDE_GRAMMAR,
            max_trails_in_memory=envs.VLLM_AUDIT_MAX_TRAILS,
            persist_to_disk=envs.VLLM_AUDIT_PERSIST,
            audit_log_dir=envs.VLLM_AUDIT_LOG_DIR,
            include_in_response=envs.VLLM_AUDIT_IN_RESPONSE,
        )
    return _TRACKER


def configure_audit_tracker(**kwargs) -> StructuredOutputAuditTracker:
    global _TRACKER
    _TRACKER = StructuredOutputAuditTracker(**kwargs)
    return _TRACKER
