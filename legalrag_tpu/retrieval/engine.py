"""FusedQueryEngine: batched serving facade over one IndexBundle.

Hosts only tokenize/encode queries and hydrate chunks; everything between is
the single fused program in ``ops.fused_query``. Batch sizes are bucketed
(like k, SURVEY.md §7.4.3) so the program set stays small and compiled.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.ops.fused_query import FusedParams, fused_hybrid_topk
from legalrag_tpu.ops.topk import bucket_k
from legalrag_tpu.schemas import RetrievalHit
from legalrag_tpu.utils.device import on_device

_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def bucket_batch(b: int) -> int:
    for s in _BATCH_BUCKETS:
        if b <= s:
            return s
    return b


class FusedQueryEngine:
    def __init__(self, bundle: IndexBundle, cfg: Optional[AppConfig] = None):
        self.bundle = bundle
        self.cfg = cfg or bundle.cfg
        self._bert_e2e = None

    def _bert_e2e_program(self):
        """Encoder forward(s) fused INTO the hybrid program: a query batch
        is ONE device execution end-to-end (bert backend)."""
        if self._bert_e2e is not None:
            return self._bert_e2e
        import functools

        import jax

        from legalrag_tpu.models.bert import bert_query_views

        enc = self.bundle.encoder
        bcfg, token_dim = enc.cfg, enc.token_dim
        q_dtype = self.bundle.tokens._query_dtype

        @functools.partial(jax.jit, static_argnames=("fp", "use_late"))
        def fn(params, proj, ids_q, mask_q, ids_t, mask_t, emb, impact,
               doc_tok, doc_mask, term_ids, term_mask, valid_n, fp,
               use_late):
            qvec, q_tok = bert_query_views(
                params, bcfg, proj, token_dim, ids_q, mask_q,
                ids_t if use_late else None, mask_t if use_late else None)
            if q_tok is not None:
                q_tok = q_tok.astype(q_dtype)
            return fused_hybrid_topk(
                emb, impact, doc_tok if use_late else None,
                doc_mask if use_late else None, qvec,
                (term_ids, term_mask), q_tok,
                mask_t.astype(bool) if use_late else None, valid_n, fp)

        self._bert_e2e = fn
        return fn

    def _params(self, top_k: int) -> FusedParams:
        r = self.cfg.retrieval
        n = max(self.bundle.dense.capacity, 1)
        return FusedParams(
            eff_k=bucket_k(min(top_k * r.oversample_factor, n), n),
            final_k=bucket_k(min(top_k, n), n),
            rrf_k=float(r.rrf_k), alpha=float(r.rrf_alpha),
            w_dense=float(r.dense_weight), w_bm25=float(r.bm25_weight),
            w_late=float(r.colbert_weight),
            dense_map_bf16=(self.cfg.engine.dense_map_dtype == "bfloat16"))

    def prepare(self, questions: Sequence[str], top_k: int = 10):
        """Host encode + device transfers ONLY (no execution). Remote
        backends serialize executions against subsequent transfers, so the
        pipelined pattern is: prepare all batches, then execute all."""
        b = len(questions)
        bp = bucket_batch(b)
        qs = list(questions) + [""] * (bp - b)
        enc = self.bundle.encoder
        use_late = (self.cfg.retrieval.enable_colbert
                    and self.bundle.tokens.n == self.bundle.dense.n
                    and self.bundle.tokens.n > 0)
        maxq = self.cfg.engine.max_query_tokens
        term_ids, term_mask = self.bundle.bm25.query_term_ids(qs, maxq)
        if hasattr(enc, "_bundle_fwd") and hasattr(enc, "_tokenize"):
            # bert backend: ship token ids; the e2e program runs the encoder
            # forward(s) inside the search program — ONE execution per batch
            q_texts = ([enc.instruction + t for t in qs]
                       if enc.instruction else qs)
            ids_q, mask_q = enc._tokenize(q_texts, enc.max_length)
            ids_t, mask_t = enc._tokenize(qs, maxq)
            with on_device(self.bundle.device):
                inputs = ("bert", ids_q, mask_q, ids_t, mask_t,
                          (jnp.asarray(term_ids), jnp.asarray(term_mask)),
                          use_late)
            return inputs, b, top_k
        with on_device(self.bundle.device):
            if hasattr(enc, "_sketch"):
                # hash backend: ship the raw sketch; the fused program
                # projects + normalizes on device (one execution per batch)
                qvec = (jnp.asarray(enc._sketch(qs, query=True)),
                        enc._projection())
            else:
                qvec = jnp.asarray(enc.encode_queries(qs))
            q_tok = q_mask = None
            if use_late:
                qt, qm = enc.encode_tokens(qs, maxq, query=True)
                q_tok = jnp.asarray(qt, self.bundle.tokens._query_dtype)
                q_mask = jnp.asarray(qm)
            inputs = ("plain", qvec,
                      (jnp.asarray(term_ids), jnp.asarray(term_mask)),
                      q_tok, q_mask, use_late)
        return inputs, b, top_k

    def execute(self, prepared):
        """Launch the fused program on prepared inputs (async)."""
        inputs, b, top_k = prepared
        params = self._params(top_k)
        bundle = self.bundle
        with on_device(bundle.device):
            if inputs[0] == "bert":
                _, ids_q, mask_q, ids_t, mask_t, qtf, use_late = inputs
                enc = bundle.encoder
                out = self._bert_e2e_program()(
                    enc.params, enc.token_proj, ids_q, mask_q, ids_t, mask_t,
                    bundle.dense.emb, bundle.bm25.impact,
                    bundle.tokens.tok if use_late else None,
                    bundle.tokens.mask if use_late else None,
                    qtf[0], qtf[1], jnp.int32(bundle.dense.n), params,
                    use_late)
            else:
                _, qvec, qtf, q_tok, q_mask, use_late = inputs
                out = fused_hybrid_topk(
                    bundle.dense.emb, bundle.bm25.impact,
                    bundle.tokens.tok if use_late else None,
                    bundle.tokens.mask if use_late else None,
                    qvec, qtf, q_tok, q_mask,
                    jnp.int32(bundle.dense.n), params)
        return out, b, top_k

    def dispatch(self, questions: Sequence[str], top_k: int = 10):
        return self.execute(self.prepare(questions, top_k))

    @staticmethod
    def collect(dispatched) -> Tuple[np.ndarray, np.ndarray, Dict[str, np.ndarray]]:
        from legalrag_tpu.ops.fused_query import PACKED_NAMES

        out, b, top_k = dispatched
        rows = np.asarray(out["rows"])[:b, :top_k]
        packed = np.asarray(out["packed"])[:b, :top_k]
        host = {name: packed[..., i]
                for i, name in enumerate(PACKED_NAMES[: packed.shape[-1]])}
        return host.pop("scores"), rows, host

    def search_batch(self, questions: Sequence[str], top_k: int = 10
                     ) -> Tuple[np.ndarray, np.ndarray, Dict[str, np.ndarray]]:
        """Returns (scores [B, k], rows [B, k], component maps)."""
        return self.collect(self.dispatch(questions, top_k))

    def search_hits(self, questions: Sequence[str], top_k: int = 10
                    ) -> List[List[RetrievalHit]]:
        scores, rows, comps = self.search_batch(questions, top_k)
        results: List[List[RetrievalHit]] = []
        min_score = self.cfg.retrieval.min_final_score
        for qi in range(len(questions)):
            hits: List[RetrievalHit] = []
            for rank, (row, score) in enumerate(zip(rows[qi], scores[qi]),
                                                start=1):
                if score < min_score:
                    continue
                chunk = self.bundle.chunks[int(row)]
                breakdown = {
                    "fusion_method": self.cfg.retrieval.fusion_method,
                    "rrf_norm": float(comps["rrf_norm"][qi, rank - 1]),
                    "weighted_sum": float(comps["weighted_sum"][qi, rank - 1]),
                    "per_channel": {
                        name: {"score": float(comps[name][qi, rank - 1])}
                        for name in ("dense", "bm25", "colbert")
                        if name in comps
                    },
                }
                hits.append(RetrievalHit(
                    chunk=chunk, score=float(score), rank=rank,
                    semantic_score=float(comps["dense"][qi, rank - 1]),
                    score_breakdown=breakdown))
            results.append(hits)
        return results
