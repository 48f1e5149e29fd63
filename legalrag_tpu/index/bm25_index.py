"""Device-resident BM25 index.

Replaces ``rank_bm25.BM25Okapi`` + pickle (reference ``bm25_builder.py:39-51``)
with an exact impact-matrix formulation scored on the MXU (see ``ops.bm25``).
Incremental adds rebuild the index — BM25's global statistics (df, avgdl)
change with every document, exactly why the reference also rebuilds instead
of appending (``incremental_bm25_builder.py:55-79``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.ops.bm25 import (
    bm25_scores_matmul,
    bm25_topk,
    build_impact_matrix,
    query_term_counts,
)
from legalrag_tpu.tokenize import tokenize
from legalrag_tpu.utils.device import on_device


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class BM25Index:
    def __init__(self, lang: str, k1: float = 1.5, b: float = 0.75,
                 epsilon: float = 0.25, device=None):
        self.lang = lang
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.device = device
        self.vocab: Dict[str, int] = {}
        self.doc_term_ids: List[np.ndarray] = []
        self.doc_term_freqs: List[np.ndarray] = []
        self.impact: Optional[jax.Array] = None  # [V_pad, N_pad]
        self.n = 0

    # ---------------------------------------------------------------- build
    def build(self, doc_token_lists: Sequence[List[str]]) -> None:
        self.vocab = {}
        self.doc_term_ids, self.doc_term_freqs = [], []
        for toks in doc_token_lists:
            counts: Dict[int, int] = {}
            for t in toks:
                tid = self.vocab.setdefault(t, len(self.vocab))
                counts[tid] = counts.get(tid, 0) + 1
            ids = np.fromiter(counts.keys(), np.int32, len(counts))
            tfs = np.fromiter(counts.values(), np.int32, len(counts))
            self.doc_term_ids.append(ids)
            self.doc_term_freqs.append(tfs)
        self.n = len(self.doc_term_ids)
        self._materialize()

    def build_from_texts(self, texts: Sequence[str]) -> None:
        self.build([tokenize(t, self.lang) for t in texts])

    def add_texts(self, texts: Sequence[str]) -> None:
        """Global-stats rebuild with the old token lists retained (the host
        CSR is the source of truth; only new texts are tokenized)."""
        new_lists = [tokenize(t, self.lang) for t in texts]
        old = [self._tokens_of(i) for i in range(self.n)]
        self.build(old + new_lists)

    def _tokens_of(self, row: int) -> List[str]:
        inv = getattr(self, "_inv_vocab", None)
        if inv is None or len(inv) != len(self.vocab):
            inv = {v: k for k, v in self.vocab.items()}
            self._inv_vocab = inv
        out: List[str] = []
        for tid, tf in zip(self.doc_term_ids[row], self.doc_term_freqs[row]):
            out.extend([inv[int(tid)]] * int(tf))
        return out

    def _materialize(self) -> None:
        v = len(self.vocab)
        impact = build_impact_matrix(self.doc_term_ids, self.doc_term_freqs, v,
                                     self.k1, self.b, self.epsilon)
        v_pad = _round_up(v, 8) if v else 8
        n_pad = _round_up(self.n, 128) if self.n else 128
        padded = np.zeros((v_pad, n_pad), np.float32)
        padded[:v, : self.n] = impact
        with on_device(self.device):
            arr = jnp.asarray(padded)
            self.impact = (jax.device_put(arr, self.device)
                           if self.device is not None else arr)

    # ---------------------------------------------------------------- query
    def query_vectors(self, queries: Sequence[str]) -> np.ndarray:
        v_pad = self.impact.shape[0]
        ids_batch = []
        for q in queries:
            toks = tokenize(q, self.lang, query=True)
            ids_batch.append([self.vocab[t] for t in toks if t in self.vocab])
        return query_term_counts(ids_batch, v_pad)

    def query_term_ids(self, queries: Sequence[str], maxlen: int = 64
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Padded (term_ids [B, L], mask [B, L]) — the KB-sized wire format
        for on-device qtf construction (see ops.fused_query)."""
        ids = np.zeros((len(queries), maxlen), np.int32)
        mask = np.zeros((len(queries), maxlen), bool)
        for i, q in enumerate(queries):
            toks = [self.vocab[t] for t in tokenize(q, self.lang,
                                                    query=True)
                    if t in self.vocab][:maxlen]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = True
        return ids, mask

    def scores(self, queries: Sequence[str]) -> np.ndarray:
        with on_device(self.device):
            qtf = jnp.asarray(self.query_vectors(queries))
            if self.device is not None:
                qtf = jax.device_put(qtf, self.device)
            s = bm25_scores_matmul(self.impact, qtf)
        return np.asarray(s)[:, : self.n]

    def topk(self, queries: Sequence[str], k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.n == 0:
            b = len(queries)
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        from legalrag_tpu.ops.topk import bucket_k

        k = min(k, self.n)
        kb = bucket_k(k, self.impact.shape[1])
        with on_device(self.device):
            qtf = jnp.asarray(self.query_vectors(queries))
            if self.device is not None:
                qtf = jax.device_put(qtf, self.device)
            s, i = bm25_topk(self.impact, qtf, jnp.int32(self.n), kb)
        return np.asarray(s)[:, :k], np.asarray(i)[:, :k]

    # -------------------------------------------------------------- persist
    def save(self, path: str | Path) -> None:
        flat_ids = (np.concatenate(self.doc_term_ids) if self.doc_term_ids
                    else np.zeros(0, np.int32))
        flat_tfs = (np.concatenate(self.doc_term_freqs) if self.doc_term_freqs
                    else np.zeros(0, np.int32))
        offsets = np.cumsum([0] + [len(a) for a in self.doc_term_ids]).astype(np.int64)
        np.savez_compressed(
            path, flat_ids=flat_ids, flat_tfs=flat_tfs, offsets=offsets,
            vocab=json.dumps(self.vocab, ensure_ascii=False),
            params=np.array([self.k1, self.b, self.epsilon], np.float64),
            lang=self.lang)

    @classmethod
    def load(cls, path: str | Path, device=None) -> "BM25Index":
        z = np.load(path, allow_pickle=False)
        k1, b, eps = z["params"]
        idx = cls(str(z["lang"]), k1=float(k1), b=float(b), epsilon=float(eps),
                  device=device)
        idx.vocab = json.loads(str(z["vocab"]))
        offsets = z["offsets"]
        flat_ids, flat_tfs = z["flat_ids"], z["flat_tfs"]
        for a, bnd in zip(offsets[:-1], offsets[1:]):
            idx.doc_term_ids.append(flat_ids[a:bnd].astype(np.int32))
            idx.doc_term_freqs.append(flat_tfs[a:bnd].astype(np.int32))
        idx.n = len(idx.doc_term_ids)
        idx._materialize()
        return idx
