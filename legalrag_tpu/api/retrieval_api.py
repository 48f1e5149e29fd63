"""Standalone retrieval microservice.

Parity with reference ``services/retrieval_api.py:31-77``: exposes
``POST /retrieve`` (route + hybrid search, serialized hits) so the main API
can split retrieval into its own process/host (docker-compose topology,
reference ``docker-compose.yml``). The main server consumes it when env
``RETRIEVAL_URL`` is set.
"""

from __future__ import annotations

import time
from typing import Optional

from legalrag_tpu.api.webcore import App, HTTPError, Request, Response
from legalrag_tpu.config import AppConfig
from legalrag_tpu.pipeline.rag_pipeline import RagPipeline
from legalrag_tpu.utils import get_logger

log = get_logger("retrieval_api")


def create_app(cfg: Optional[AppConfig] = None) -> App:
    cfg = cfg or AppConfig.load()
    app = App()
    pipeline = RagPipeline(cfg)

    @app.get("/health")
    def health(req: Request) -> Response:
        return Response({"status": "ok"})

    @app.post("/retrieve")
    def retrieve(req: Request) -> Response:
        body = req.json()
        question = (body.get("question") or "").strip()
        if not question:
            raise HTTPError(422, "question is required")
        hits, decision = pipeline.retrieve(question, top_k=body.get("top_k"))
        return Response({
            "question": question,
            "decision": decision.model_dump(),
            "hits": [h.model_dump(exclude_none=True) for h in hits],
        })

    return app


def main() -> None:
    cfg = AppConfig.load()
    app = create_app(cfg)
    app.serve(cfg.server.host, cfg.server.port)
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
