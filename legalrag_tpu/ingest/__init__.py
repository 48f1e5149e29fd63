from legalrag_tpu.ingest.ingestor import PDFIngestor, compute_doc_id
from legalrag_tpu.ingest.orchestrator import IngestOrchestrator
from legalrag_tpu.ingest.service import IngestService
from legalrag_tpu.ingest.task_queue import TaskQueue

__all__ = ["IngestOrchestrator", "IngestService", "PDFIngestor", "TaskQueue",
           "compute_doc_id"]
