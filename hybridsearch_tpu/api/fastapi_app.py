"""FastAPI adapter over the framework-agnostic router.

Provides the same route table as api/httpd.py for deployments where
fastapi/uvicorn are installed (the reference's serving stack,
reference api.py + Dockerfile:36). Import is gated: this module raises
ImportError when fastapi is absent, and nothing else in the framework
depends on it.
"""

from __future__ import annotations

from typing import Optional

from fastapi import FastAPI, Request
from fastapi.responses import JSONResponse

from hybridsearch_tpu.api.app import EngineState, build_router


def create_app(state: Optional[EngineState] = None, **state_kwargs) -> FastAPI:
    state = state or EngineState(**state_kwargs)
    router = build_router(state)
    app = FastAPI(title="hybridsearch_tpu", version="0.1.0")
    app.state.engine = state

    @app.on_event("shutdown")
    def _shutdown() -> None:
        state.close()

    @app.api_route(
        "/{full_path:path}", methods=["GET", "POST", "DELETE"]
    )
    async def dispatch(full_path: str, request: Request) -> JSONResponse:
        body = {}
        if request.method in ("POST", "DELETE"):
            try:
                body = await request.json()
            except Exception:
                body = {}
        api_key = request.headers.get("X-API-Key")
        auth = request.headers.get("Authorization", "")
        if api_key is None and auth.startswith("Bearer "):
            api_key = auth[7:]
        status, payload, headers = router.dispatch(
            request.method,
            "/" + full_path,
            body=body,
            query=dict(request.query_params),
            api_key=api_key,
            client_ip=request.client.host if request.client else "unknown",
        )
        return JSONResponse(payload, status_code=status, headers=headers)

    return app
