"""HybridRetriever — the retrieval hot path.

Orchestration parity with the reference ``HybridRetriever.search``
(``hybrid_retriever.py:282-384``): oversampled per-channel search → fusion →
min-score filter → optional graph expansion (GRAPH_AUGMENTED) → optional
rerank of the top-N with β-blend → dedup-keep-best with provenance union →
per-stage ms timing log (the de-facto perf interface, SURVEY.md §5.1) →
top-k. Channels share corpus rows on device, so everything between encode
and hit hydration is device work.

Deliberate divergence (documented): ``eff_top_k = top_k × oversample_factor``
honors the reference's *intent*; the shipped code oversampled to ``top_k``
only by accident (SURVEY.md §2.13.8).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from legalrag_tpu.config import AppConfig
from legalrag_tpu.graph.store import LawGraphStore
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.retrieval.channels import (
    BM25Retriever,
    DenseRetriever,
    GraphRetriever,
    LateInteractionRetriever,
    make_hits,
)
from legalrag_tpu.retrieval.fusion import ChannelResult, fuse
from legalrag_tpu.retrieval.rerankers import RerankerFactory, rerank_candidates
from legalrag_tpu.schemas import RetrievalHit, RoutingDecision, RoutingMode
from legalrag_tpu.utils import get_logger

log = get_logger("hybrid")


class HybridRetriever:
    def __init__(self, bundle: IndexBundle, cfg: AppConfig,
                 graph_store: Optional[LawGraphStore] = None, llm=None):
        self.bundle = bundle
        self.cfg = cfg
        self.llm = llm
        self.dense = DenseRetriever(bundle)
        self.bm25 = BM25Retriever(bundle)
        self.late = (LateInteractionRetriever(bundle, cfg.engine.late_candidates)
                     if cfg.retrieval.enable_colbert else None)
        self.graph: Optional[GraphRetriever] = None
        if cfg.retrieval.enable_graph and graph_store is not None:
            self.graph = GraphRetriever(bundle, graph_store, cfg)
        self._bert_e2e = None  # lazily-built encoder-fused one-shot program
        self._bert_sharded = {}  # (mesh, kb, use_late) -> fused sharded fn
        from legalrag_tpu.retrieval.batcher import MicroBatcher

        e = cfg.engine
        self._batcher = MicroBatcher(
            self._channels_topk_batch,
            window_s=e.microbatch_window_ms / 1000.0,
            max_batch=min(e.microbatch_max, e.max_query_batch))

    def _bert_oneshot_program(self):
        """ONE jitted program for the bert backend: encoder forward(s) fused
        INTO the channels program — a query is a single device execution
        (remote backends: one round trip instead of two)."""
        if self._bert_e2e is not None:
            return self._bert_e2e
        import functools

        import jax

        from legalrag_tpu.models.bert import bert_query_views
        from legalrag_tpu.ops.fused_query import fused_channels_topk

        enc = self.bundle.encoder
        bcfg, token_dim = enc.cfg, enc.token_dim
        q_dtype = self.bundle.tokens._query_dtype  # match per-channel casts

        @functools.partial(jax.jit, static_argnames=("eff_k", "use_late"))
        def fn(params, proj, ids_q, mask_q, ids_t, mask_t, emb, impact,
               doc_tok, doc_mask, term_ids, term_mask, valid_n, eff_k,
               use_late):
            qvec, q_tok = bert_query_views(
                params, bcfg, proj, token_dim, ids_q, mask_q,
                ids_t if use_late else None, mask_t if use_late else None)
            if q_tok is not None:
                q_tok = q_tok.astype(q_dtype)
            return fused_channels_topk(
                emb, impact, doc_tok if use_late else None,
                doc_mask if use_late else None, qvec,
                (term_ids, term_mask), q_tok,
                mask_t.astype(bool) if use_late else None, valid_n, eff_k)

        self._bert_e2e = fn
        return fn

    def _bert_sharded_oneshot(self, kb: int, use_late: bool):
        """Encoder-fused SHARDED serving program (one execution per batch;
        VERDICT r2 #4), cached per (mesh, k-bucket, late)."""
        key = (self.bundle.mesh, kb, use_late)
        fn = self._bert_sharded.get(key)
        if fn is None:
            from legalrag_tpu.parallel.sharded_search import (
                make_sharded_bert_channels_step,
            )

            enc = self.bundle.encoder
            fn = make_sharded_bert_channels_step(
                self.bundle.mesh, kb, use_late, enc.cfg, enc.token_dim,
                self.bundle.tokens._query_dtype)
            self._bert_sharded[key] = fn
        return fn

    def _channels_topk_all(self, question: str, eff_k: int):
        """All channels' top-eff_k for ONE question — via the micro-batcher,
        so concurrent request threads share a single device execution
        (``retrieval/batcher.py``). Result arrays keep a leading batch dim
        of 1; semantics are identical to a solo ``_channels_topk_batch``."""
        return self._batcher.run(question, eff_k)

    def _channels_topk_batch(self, questions, eff_k: int):
        """All channels' top-eff_k for a question batch from ONE device
        execution.

        Remote backends pay a per-execution round trip (~70 ms); the
        per-channel path costs three *per question*. This program computes
        every channel's score map and top-k for the whole batch in one
        launch; results are identical to the per-channel calls (same
        programs' math; tested), so fusion and explainability downstream
        are unchanged.

        Works for BOTH encoder backends: the hash backend ships its cheap
        host sketch and projects on device; the bert backend runs its (one)
        jitted encoder forward and feeds the embeddings in — 2 executions
        per query instead of 4 (VERDICT r1 #4). When the bundle is sharded
        (``engine.n_index_shards``), the same lists come from the multi-chip
        all_gather merge step instead — exact agreement tested."""
        import jax.numpy as jnp
        import numpy as np

        from legalrag_tpu.ops.fused_query import fused_channels_topk
        from legalrag_tpu.ops.topk import bucket_k
        from legalrag_tpu.retrieval.engine import bucket_batch
        from legalrag_tpu.utils.device import on_device

        bundle = self.bundle
        enc = bundle.encoder
        if bundle.dense.n == 0:
            return None
        use_late = (self.late is not None
                    and bundle.tokens.n == bundle.dense.n
                    and bundle.tokens.n > 0)
        eff_k = min(eff_k, bundle.dense.n)
        kb = bucket_k(eff_k, bundle.dense.capacity)
        nb = len(questions)
        # pad to a batch bucket so the compiled-program set stays small
        qs = list(questions) + [""] * (bucket_batch(nb) - nb)
        maxlen = self.cfg.engine.max_query_tokens
        views = bundle.shard_views()
        is_bert = hasattr(enc, "_bundle_fwd") and hasattr(enc, "_tokenize")
        if is_bert:
            # bert backend: encoder + all channels in ONE program — both
            # unsharded and sharded (VERDICT r2 #4: the sharded case used
            # to pay a second execution per batch for the encoder)
            ids, mask = bundle.bm25.query_term_ids(qs, maxlen)
            q_texts = ([enc.instruction + t for t in qs]
                       if enc.instruction else qs)
            ids_q, mask_q = enc._tokenize(q_texts, enc.max_length)
            ids_t, mask_t = enc._tokenize(qs, maxlen)
            with on_device(bundle.device):
                if views is None:
                    out = self._bert_oneshot_program()(
                        enc.params, enc.token_proj, ids_q, mask_q, ids_t,
                        mask_t, bundle.dense.emb, bundle.bm25.impact,
                        bundle.tokens.tok if use_late else None,
                        bundle.tokens.mask if use_late else None,
                        jnp.asarray(ids), jnp.asarray(mask),
                        jnp.int32(bundle.dense.n), kb, use_late)
                else:
                    out = self._bert_sharded_oneshot(kb, use_late)(
                        enc.params, enc.token_proj, ids_q, mask_q, ids_t,
                        mask_t, views["emb"], views["impact"],
                        views.get("tok") if use_late else jnp.zeros(()),
                        views.get("mask") if use_late else jnp.zeros(()),
                        jnp.asarray(ids), jnp.asarray(mask),
                        jnp.int32(bundle.dense.n))
                    names = (("dense", "bm25", "colbert") if use_late
                             else ("dense", "bm25"))
                    out = dict(zip(names, out[:-1]), qvec=out[-1])
            qvec_out = out.pop("qvec")
            res = {name: (np.asarray(s)[:nb, :eff_k],
                          np.asarray(i)[:nb, :eff_k])
                   for name, (s, i) in out.items()}
            res["qvec"] = np.asarray(qvec_out)[:nb]
            return res
        with on_device(bundle.device):
            q_tok = q_mask = None
            if hasattr(enc, "_sketch"):
                qvec = (jnp.asarray(enc._sketch(qs, query=True)),
                        enc._projection())
                if use_late:
                    qt, qm = enc.encode_tokens(qs, maxlen, query=True)
            elif use_late and hasattr(enc, "encode_query_bundle"):
                # one encoder execution for BOTH query views (bert backend)
                qv, qt, qm = enc.encode_query_bundle(qs, maxlen)
                qvec = jnp.asarray(qv)
            else:
                qvec = jnp.asarray(enc.encode_queries(qs))
                if use_late:
                    qt, qm = enc.encode_tokens(qs, maxlen, query=True)
            ids, mask = bundle.bm25.query_term_ids(qs, maxlen)
            if use_late:
                q_tok = jnp.asarray(qt, bundle.tokens._query_dtype)
                q_mask = jnp.asarray(qm)
            if views is not None:
                from legalrag_tpu.parallel.sharded_search import (
                    sharded_channels_topk,
                )

                out = sharded_channels_topk(
                    bundle.mesh, kb, views["emb"], views["impact"],
                    views.get("tok") if use_late else None,
                    views.get("mask") if use_late else None,
                    qvec, (jnp.asarray(ids), jnp.asarray(mask)),
                    q_tok, q_mask, jnp.int32(bundle.dense.n))
            else:
                out = fused_channels_topk(
                    bundle.dense.emb, bundle.bm25.impact,
                    bundle.tokens.tok if use_late else None,
                    bundle.tokens.mask if use_late else None,
                    qvec, (jnp.asarray(ids), jnp.asarray(mask)), q_tok, q_mask,
                    jnp.int32(bundle.dense.n), kb)
        qvec_out = out.pop("qvec")
        res = {name: (np.asarray(s)[:nb, :eff_k], np.asarray(i)[:nb, :eff_k])
               for name, (s, i) in out.items()}
        res["qvec"] = np.asarray(qvec_out)[:nb]
        return res

    def _hyde_expansion(self, question: str) -> Optional[str]:
        """HyDE: one hypothetical statutory answer, embedded alongside the
        query for the dense channel. Skipped silently without a live LLM."""
        if self.llm is None or getattr(self.llm, "is_degraded", True):
            return None
        from legalrag_tpu.utils import has_chinese

        prompt = ("请用一段法言法语写出最可能回答该问题的法条内容（不超过80字，"
                  "不要条文编号）：" if has_chinese(question) else
                  "Write one statutory-style paragraph (max 60 words, no "
                  "section numbers) that would answer: ")
        try:
            text = self.llm.chat(
                [{"role": "user", "content": prompt + question}], tag="hyde")
            return (text or "").strip()[:400] or None
        except Exception:
            return None

    # ------------------------------------------------------ channel APIs
    def search_dense(self, question: str, top_k: int = 10) -> List[RetrievalHit]:
        return self.dense.search(question, top_k)

    def search_bm25(self, question: str, top_k: int = 10) -> List[RetrievalHit]:
        return self.bm25.search(question, top_k)

    def search_colbert(self, question: str, top_k: int = 10) -> List[RetrievalHit]:
        if self.late is None:
            return []
        return self.late.search(question, top_k)

    def search_graph(self, question: str, seeds: Sequence[str],
                     top_k: int = 0) -> List[RetrievalHit]:
        if self.graph is None:
            return []
        return self.graph.search(question, seeds, top_k)

    # ------------------------------------------------------------- search
    def search(self, question: str, top_k: Optional[int] = None,
               decision: Optional[RoutingDecision] = None) -> List[RetrievalHit]:
        r = self.cfg.retrieval
        top_k = top_k or r.top_k
        eff_k = max(top_k, top_k * r.oversample_factor)
        t: Dict[str, float] = {}
        t0 = time.perf_counter()

        def clock(name: str, start: float) -> float:
            now = time.perf_counter()
            t[name] = (now - start) * 1000
            return now

        from legalrag_tpu.utils.tracing import trace_span

        # channel searches (each one jitted device program)
        mark = t0
        dense_query = question
        if r.enable_hyde:
            hyde = self._hyde_expansion(question)
            if hyde:
                dense_query = f"{question}\n{hyde}"
                mark = clock("hyde", mark)
        one_shot = None
        if dense_query == question:
            with trace_span("retrieval.channels"):
                one_shot = self._channels_topk_all(question, eff_k)
        if one_shot is not None:
            mark = clock("channels", mark)
            channels = [
                ChannelResult("dense", r.dense_weight,
                              one_shot["dense"][1][0], one_shot["dense"][0][0]),
                ChannelResult("bm25", r.bm25_weight,
                              one_shot["bm25"][1][0], one_shot["bm25"][0][0]),
            ]
            if "colbert" in one_shot:
                channels.append(ChannelResult(
                    "colbert", r.colbert_weight,
                    one_shot["colbert"][1][0], one_shot["colbert"][0][0]))
        else:
            with trace_span("retrieval.dense"):
                dense_s, dense_rows = self.dense.search_rows([dense_query],
                                                             eff_k)
            mark = clock("dense", mark)
            with trace_span("retrieval.bm25"):
                bm25_s, bm25_rows = self.bm25.search_rows([question], eff_k)
            mark = clock("bm25", mark)
            channels = [
                ChannelResult("dense", r.dense_weight, dense_rows[0], dense_s[0]),
                ChannelResult("bm25", r.bm25_weight, bm25_rows[0], bm25_s[0]),
            ]
            if self.late is not None:
                with trace_span("retrieval.colbert"):
                    late_s, late_rows = self.late.search_rows([question], eff_k)
                channels.append(ChannelResult("colbert", r.colbert_weight,
                                              late_rows[0], late_s[0]))
                mark = clock("colbert", mark)

        fused = fuse(channels, method=r.fusion_method, rrf_k=r.rrf_k,
                     alpha=r.rrf_alpha)
        hits: List[RetrievalHit] = []
        for cand in fused:
            chunk = self.bundle.chunks[cand.row]
            sem = cand.breakdown.get("per_channel", {}).get("dense", {}).get("score")
            hits.append(RetrievalHit(chunk=chunk, score=cand.score,
                                     source="retriever", semantic_score=sem,
                                     score_breakdown=cand.breakdown))
        mark = clock("fuse", mark)

        hits = [h for h in hits if h.score >= r.min_final_score]

        if (decision is not None and decision.mode == RoutingMode.GRAPH_AUGMENTED
                and self.graph is not None):
            seeds = [h.chunk.article_id for h in hits[: r.graph_seed_k]]
            qv = one_shot["qvec"][0] if one_shot is not None else None
            hits.extend(self.graph.search(question, seeds, top_k=0,
                                          query_emb=qv))
            mark = clock("graph", mark)

        if r.enable_rerank and hits:
            head = hits[: r.rerank_top_n]
            tail = hits[r.rerank_top_n:]
            reranker = RerankerFactory.create(self.cfg, self.bundle,
                                              llm=self.llm, top_k=r.rerank_top_n)
            head = rerank_candidates(question, head, reranker,
                                     beta=r.rerank_beta, norm=r.rerank_norm)
            hits = head + tail
            mark = clock("rerank", mark)

        hits = dedup_keep_best(hits)
        t["total"] = (time.perf_counter() - t0) * 1000
        log.info("[retrieval] %s",
                 " ".join(f"{k}={v:.1f}ms" for k, v in t.items()))
        for rank, h in enumerate(hits[:top_k], start=1):
            h.rank = rank
        return hits[:top_k]


def dedup_keep_best(hits: List[RetrievalHit]) -> List[RetrievalHit]:
    """Keep the best-scoring hit per chunk id; union channel provenance and
    sum channel contributions (reference ``_dedup_keep_best``,
    ``hybrid_retriever.py:71-130``)."""
    best: Dict[str, RetrievalHit] = {}
    order: List[str] = []
    for h in hits:
        cid = h.chunk.id
        cur = best.get(cid)
        if cur is None:
            best[cid] = h
            order.append(cid)
            continue
        keep, drop = (h, cur) if h.score > cur.score else (cur, h)
        kb = dict(keep.score_breakdown or {})
        db = drop.score_breakdown or {}
        merged_channels = list(dict.fromkeys(
            (kb.get("channels") or ([kb["channel"]] if "channel" in kb else []))
            + (db.get("channels") or ([db["channel"]] if "channel" in db else []))))
        if merged_channels:
            kb["channels"] = merged_channels
        contrib = dict(kb.get("channel_contrib") or {})
        for k, v in (db.get("channel_contrib") or {}).items():
            contrib[k] = contrib.get(k, 0.0) + v
        if contrib:
            kb["channel_contrib"] = contrib
        keep.score_breakdown = kb
        if keep.graph_depth is None:
            keep.graph_depth = drop.graph_depth
        best[cid] = keep
    out = sorted((best[c] for c in order), key=lambda h: -h.score)
    return out
