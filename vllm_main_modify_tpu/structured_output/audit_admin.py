"""Audit admin HTTP API (fork parity).

Reference: vllm/v1/structured_output/audit_admin_api.py — routes under
``/v1/admin/audit``: GET /stats, GET /list, GET /trail/{request_id},
POST /export, DELETE /trail/{request_id}, POST /clear, GET /health
(mounted into the server at api_server.py:1521-1522).
"""

from __future__ import annotations

import json
import os
import time

from aiohttp import web

from vllm_main_modify_tpu.structured_output.audit_tracker import \
    get_audit_tracker

PREFIX = "/v1/admin/audit"


def register_audit_routes(router, engine=None) -> None:
    tracker = get_audit_tracker()

    async def stats(request: web.Request) -> web.Response:
        return web.json_response(tracker.stats())

    async def list_trails(request: web.Request) -> web.Response:
        backend_type = request.query.get("backend_type")
        include_active = request.query.get("include_active",
                                           "true") == "true"
        limit = int(request.query.get("limit", "100"))
        trails = tracker.get_all_trails()
        out = []
        for t in trails.values():
            if backend_type and t.backend_type != backend_type:
                continue
            if not include_active and t.end_time is None:
                continue
            out.append(t.summary())
        out.sort(key=lambda d: d.get("start_time", 0.0), reverse=True)
        return web.json_response(out[:limit])

    async def trail_detail(request: web.Request) -> web.Response:
        rid = request.match_info["request_id"]
        include_events = request.query.get("include_events",
                                           "true") == "true"
        trail = tracker.get_trail(rid)
        if trail is None:
            return web.json_response(
                {"message": f"trail {rid!r} not found"}, status=404)
        return web.json_response(trail.to_dict(include_events))

    async def export(request: web.Request) -> web.Response:
        body = await request.json() if request.can_read_body else {}
        path = body.get("path") or os.path.join(
            "/tmp", f"audit-export-{int(time.time())}.jsonl")
        include_events = body.get("include_events", True)
        trails = tracker.get_all_trails()
        with open(path, "w") as f:
            for t in trails.values():
                f.write(json.dumps(t.to_dict(include_events)) + "\n")
        return web.json_response(
            {"path": path, "num_trails": len(trails)})

    async def delete_trail(request: web.Request) -> web.Response:
        rid = request.match_info["request_id"]
        if not tracker.remove_trail(rid):
            return web.json_response(
                {"message": f"trail {rid!r} not found"}, status=404)
        return web.json_response({"deleted": rid})

    async def clear(request: web.Request) -> web.Response:
        return web.json_response({"cleared": tracker.clear()})

    async def health(request: web.Request) -> web.Response:
        return web.json_response({
            "enabled": tracker.is_enabled(),
            "healthy": True,
        })

    router.add_get(f"{PREFIX}/stats", stats)
    router.add_get(f"{PREFIX}/list", list_trails)
    router.add_get(f"{PREFIX}/trail/{{request_id}}", trail_detail)
    router.add_post(f"{PREFIX}/export", export)
    router.add_delete(f"{PREFIX}/trail/{{request_id}}", delete_trail)
    router.add_post(f"{PREFIX}/clear", clear)
    router.add_get(f"{PREFIX}/health", health)
