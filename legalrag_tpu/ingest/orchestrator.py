"""Ingest orchestration: apply new chunks to the live per-language index.

Parity with reference ``IngestOrchestrator`` (``orchestrator.py:32-75``) with
the unified-bundle twist: the dense/bm25/colbert channels live in one
``IndexBundle``, so one *index job* appends to all three (dense/token rows
append in place; BM25 rebuilds its global stats — the same semantics the
reference implements as three separate jobs), then persists the bundle
(generation bump → serving caches reload). The *graph job* rebuilds the law
graph over the whole corpus. Per-doc status strings keep the reference's
four-key shape {faiss, bm25, colbert, graph} for API parity.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from typing import Dict, List

from legalrag_tpu.config import AppConfig
from legalrag_tpu.corpus import load_chunks_from_dir
from legalrag_tpu.graph import GraphBuilder
from legalrag_tpu.retrieval.by_lang import BundleCache
from legalrag_tpu.schemas import LawChunk
from legalrag_tpu.utils import get_logger

log = get_logger("ingest.orchestrator")


class IngestOrchestrator:
    def __init__(self, cfg: AppConfig, cache: BundleCache):
        self.cfg = cfg
        self.cache = cache
        self.status: Dict[str, Dict[str, str]] = {}
        self._lock = threading.Lock()

    def init_status(self, doc_id: str) -> None:
        with self._lock:
            self.status[doc_id] = {k: "scheduled" for k in
                                   ("faiss", "bm25", "colbert", "graph")}

    def get_status(self, doc_id: str) -> Dict[str, str]:
        with self._lock:
            return dict(self.status.get(doc_id, {}))

    def _set(self, doc_id: str, key: str, value: str) -> None:
        with self._lock:
            self.status.setdefault(doc_id, {})[key] = value

    # ------------------------------------------------------------------
    def index_job(self, doc_id: str, chunks: List[LawChunk]) -> None:
        """Append chunks to each affected language bundle and persist."""
        by_lang = defaultdict(list)
        for c in chunks:
            by_lang[c.lang or "zh"].append(c)
        try:
            for lang, lang_chunks in by_lang.items():
                bundle = self.cache.get(lang)
                added = bundle.add_chunks(lang_chunks)
                bundle.save(self.cache.index_dir(lang))
                self.cache.put(lang, bundle)
                log.info("[%s] ingest %s: +%d chunks (n=%d)", lang, doc_id,
                         added, bundle.n_docs)
            for key in ("faiss", "bm25", "colbert"):
                enabled = key != "colbert" or self.cfg.retrieval.enable_colbert
                self._set(doc_id, key, "added" if enabled else "disabled")
        except Exception as e:
            log.error("index job failed for %s: %s", doc_id, e, exc_info=True)
            for key in ("faiss", "bm25", "colbert"):
                self._set(doc_id, key, f"error: {e}")

    def graph_job(self, doc_id: str) -> None:
        if not self.cfg.pdf.ingest_rebuild_graph:
            self._set(doc_id, "graph", "disabled")
            return
        try:
            chunks = load_chunks_from_dir(self.cfg.paths.processed_dir)
            by_lang = defaultdict(list)
            for c in chunks:
                by_lang[c.lang or "zh"].append(c)
            for lang, lang_chunks in by_lang.items():
                out = self.cfg.with_lang(lang).paths.graph_file
                GraphBuilder().build_to_file(lang_chunks, out)
            self._set(doc_id, "graph", "added")
        except Exception as e:
            log.error("graph job failed for %s: %s", doc_id, e, exc_info=True)
            self._set(doc_id, "graph", f"error: {e}")
