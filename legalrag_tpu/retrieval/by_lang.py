"""Language routing + serving-side bundle cache.

``ByLangRetriever`` detects the query language and lazily owns one
``HybridRetriever`` per language over ``cfg.with_lang(lang)`` (parity:
reference ``by_lang_retriever.py:16-29``).

``BundleCache`` replaces the reference's per-file mtime polling
(``vector_store.py:95-129``) with one manifest-generation check per lookup:
the live server picks up incremental ingests / newly activated index
versions without restart (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax

from legalrag_tpu.config import AppConfig
from legalrag_tpu.graph.store import LawGraphStore
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.retrieval.hybrid import HybridRetriever
from legalrag_tpu.schemas import RetrievalHit, RoutingDecision
from legalrag_tpu.utils import detect_lang, get_logger

log = get_logger("by_lang")


class BundleCache:
    """Loads bundles per language; reloads when the on-disk manifest
    generation moves past the in-memory one. Checks are throttled."""

    def __init__(self, cfg: AppConfig, device=None, check_interval: float = 2.0):
        self.cfg = cfg
        self.device = device
        self.check_interval = check_interval
        self._bundles: Dict[str, IndexBundle] = {}
        self._last_check: Dict[str, float] = {}
        self._mesh = None
        self.failed_over = False  # device loss → CPU serving (see search)

    def _serving_mesh(self):
        """Lazy (1, n_index_shards) mesh for multi-chip serving
        (n_index_shards=-1: slice-major mesh over every visible device —
        multi-host when jax.distributed is up, see parallel.mesh)."""
        if self._mesh is None:
            from legalrag_tpu.parallel.mesh import (
                init_multihost, local_devices, make_global_mesh, make_mesh)

            init_multihost()  # no-op solo; logs if called too late
            s = self.cfg.engine.n_index_shards
            if s == 0 or s < -1:
                raise ValueError(
                    f"engine.n_index_shards={s} is meaningless — use 1 "
                    "(off), N>=2 (N shards), or -1 (every visible device)")
            devs = local_devices()
            if s == -1:
                self._mesh = make_global_mesh(devs)
                return self._mesh
            if len(devs) < s:
                raise RuntimeError(
                    f"engine.n_index_shards={s} but only {len(devs)} "
                    "devices visible")
            self._mesh = make_mesh(devs[:s], data=1, model=s)
        return self._mesh

    def index_dir(self, lang: str) -> Path:
        return Path(self.cfg.with_lang(lang).paths.lang_index_dir)

    def get(self, lang: str) -> IndexBundle:
        now = time.monotonic()
        bundle = self._bundles.get(lang)
        if bundle is not None and now - self._last_check.get(lang, 0) < self.check_interval:
            return bundle
        d = self.index_dir(lang)
        manifest = d / "manifest.json"
        if not manifest.exists():
            raise FileNotFoundError(
                f"no index for lang={lang} at {d}; run scripts.build_index")
        self._last_check[lang] = now
        gen = json.loads(manifest.read_text(encoding="utf-8")).get("generation", 0)
        if bundle is None or gen > bundle.generation:
            lang_cfg = self.cfg.with_lang(lang)
            log.info("[%s] (re)loading index generation=%s from %s", lang, gen, d)
            bundle = IndexBundle.load(d, lang_cfg, lang, device=self.device)
            if self.cfg.engine.n_index_shards != 1 and not self.failed_over:
                bundle.enable_sharding(self._serving_mesh())
            self._bundles[lang] = bundle
        return bundle

    def failover_to_cpu(self) -> None:
        """Drop every cached bundle and pin future loads to host CPU —
        called when the accelerator starts failing mid-serving. Sharding
        is disabled for the failed-over bundles (the mesh lived on the
        dead device)."""
        import jax as _jax

        self.device = _jax.devices("cpu")[0]
        self.failed_over = True
        self._mesh = None
        self._bundles.clear()
        self._last_check.clear()
        try:
            from legalrag_tpu.utils.metrics import METRICS

            METRICS.inc("legalrag_device_failover")
        except Exception:
            pass

    def put(self, lang: str, bundle: IndexBundle) -> None:
        """Install a live bundle (in-process ingest path)."""
        if (self.cfg.engine.n_index_shards != 1 and not self.failed_over
                and bundle.mesh is None):
            bundle.enable_sharding(self._serving_mesh())
        self._bundles[lang] = bundle
        self._last_check[lang] = time.monotonic()


class ByLangRetriever:
    def __init__(self, cfg: AppConfig, device=None, llm=None,
                 cache: Optional[BundleCache] = None):
        self.cfg = cfg
        self.llm = llm
        self.cache = cache or BundleCache(cfg, device=device)
        self._retrievers: Dict[str, HybridRetriever] = {}
        self._graphs: Dict[str, LawGraphStore] = {}

    def graph_store(self, lang: str) -> LawGraphStore:
        if lang not in self._graphs:
            lang_cfg = self.cfg.with_lang(lang)
            self._graphs[lang] = LawGraphStore(lang_cfg.paths.graph_file)
        return self._graphs[lang]

    def retriever(self, lang: str) -> HybridRetriever:
        bundle = self.cache.get(lang)
        hr = self._retrievers.get(lang)
        if hr is None or hr.bundle is not bundle:
            hr = HybridRetriever(bundle, self.cfg.with_lang(lang),
                                 graph_store=self.graph_store(lang),
                                 llm=self.llm)
            self._retrievers[lang] = hr
        return hr

    def search(self, question: str, top_k: Optional[int] = None,
               decision: Optional[RoutingDecision] = None) -> List[RetrievalHit]:
        lang = detect_lang(question)
        try:
            return self.retriever(lang).search(question, top_k=top_k,
                                               decision=decision)
        except jax.errors.JaxRuntimeError as e:
            # Accelerator died mid-serving (relay tunnels genuinely do
            # this — FAILED_PRECONDITION on every op): rebuild the index
            # on host CPU and keep answering, slower but alive. One rung
            # below the reference's channel-disable ladder (SURVEY §5.3),
            # which has no analogue for device loss.
            log.error("[%s] device execution failed (%s); failing over "
                      "to CPU serving", lang, str(e)[:200])
            self.cache.failover_to_cpu()
            self._retrievers.pop(lang, None)
            return self.retriever(lang).search(question, top_k=top_k,
                                               decision=decision)
