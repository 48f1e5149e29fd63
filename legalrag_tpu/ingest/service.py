"""Ingest service: upload → extract → schedule background indexing.

Parity with reference ``IngestService`` (``service.py:18-38``): save the
upload, synchronously extract+chunk to JSONL, initialize the per-doc status
dict, then enqueue the index/graph jobs on the background TaskQueue.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

from legalrag_tpu.config import AppConfig
from legalrag_tpu.ingest.ingestor import PDFIngestor
from legalrag_tpu.ingest.orchestrator import IngestOrchestrator
from legalrag_tpu.ingest.task_queue import TaskQueue
from legalrag_tpu.retrieval.by_lang import BundleCache
from legalrag_tpu.utils import get_logger

log = get_logger("ingest.service")


class IngestService:
    def __init__(self, cfg: AppConfig, cache: BundleCache):
        self.cfg = cfg
        self.ingestor = PDFIngestor(cfg)
        self.orchestrator = IngestOrchestrator(cfg, cache)
        self.queue = TaskQueue("ingest")

    def ingest_upload_and_schedule(self, filename: str, content: bytes
                                   ) -> Tuple[str, int]:
        """Returns (doc_id, n_chunks)."""
        upload_dir = Path(self.cfg.paths.upload_dir)
        upload_dir.mkdir(parents=True, exist_ok=True)
        safe = Path(filename).name or "upload.bin"
        path = upload_dir / safe
        path.write_bytes(content)
        doc_id, _out, chunks = self.ingestor.ingest_file_to_jsonl(path, safe)
        self.orchestrator.init_status(doc_id)
        self.queue.enqueue(self.orchestrator.index_job, doc_id, chunks)
        self.queue.enqueue(self.orchestrator.graph_job, doc_id)
        return doc_id, len(chunks)

    def get_status(self, doc_id: str) -> Dict[str, str]:
        return self.orchestrator.get_status(doc_id)
