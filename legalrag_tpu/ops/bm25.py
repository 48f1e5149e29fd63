"""BM25 scoring math + device scoring ops.

Numeric parity with ``rank_bm25.BM25Okapi`` (the reference's sparse channel,
``bm25_builder.py:39-51``, ``bm25_retriever.py:69-76``) is a hard requirement
for recall parity (SURVEY.md §7.4.4). The exact algorithm reproduced here:

- ``idf_t = ln(N - df_t + 0.5) - ln(df_t + 0.5)``
- terms with negative idf are floored to ``epsilon * average_idf`` where
  ``average_idf`` is the mean of the *raw* idfs over the vocabulary
  (including negative ones) and ``epsilon = 0.25``
- ``score(q, d) = Σ_{t ∈ q} idf_t · tf_td·(k1+1) / (tf_td + k1·(1−b+b·dl_d/avgdl))``
  with k1=1.5, b=0.75; a query token repeated r times contributes r times;
  unknown tokens contribute 0.

TPU design: the per-(term, doc) contribution ``c_td = idf_t · tf_td·(k1+1) /
(tf_td + norm_d)`` is query-independent, so scoring is a sparse-matrix /
dense-vector product ``S = Q @ C`` with Q the query term-count matrix. At
statute-corpus scale we materialize C as a dense [V, N] *impact matrix* in
HBM and ride the MXU — one matmul scores every document exactly, no scatter.
(A postings-gather path is the planned Pallas kernel for vocab·docs products
that outgrow HBM; see ops/bm25_sparse.py.)
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_idf(df: np.ndarray, n_docs: int, epsilon: float = 0.25) -> np.ndarray:
    """Vocabulary idf vector with BM25Okapi's negative-idf epsilon floor."""
    df = np.asarray(df, np.float64)
    idf = np.log(n_docs - df + 0.5) - np.log(df + 0.5)
    if idf.size:
        avg = idf.mean()
        idf = np.where(idf < 0, epsilon * avg, idf)
    return idf


def build_impact_matrix(doc_term_ids: Sequence[np.ndarray],
                        doc_term_freqs: Sequence[np.ndarray],
                        vocab_size: int, k1: float = 1.5, b: float = 0.75,
                        epsilon: float = 0.25) -> np.ndarray:
    """Dense [V, N] float32 impact matrix from per-doc (term_id, tf) pairs."""
    n_docs = len(doc_term_ids)
    df = np.zeros(vocab_size, np.int64)
    doc_len = np.zeros(n_docs, np.float64)
    for d, (ids, tfs) in enumerate(zip(doc_term_ids, doc_term_freqs)):
        df[ids] += 1
        doc_len[d] = tfs.sum()
    avgdl = doc_len.mean() if n_docs else 1.0
    idf = compute_idf(df, n_docs, epsilon)
    impact = np.zeros((vocab_size, n_docs), np.float32)
    norm = k1 * (1.0 - b + b * doc_len / max(avgdl, 1e-9))
    for d, (ids, tfs) in enumerate(zip(doc_term_ids, doc_term_freqs)):
        tf = tfs.astype(np.float64)
        impact[ids, d] = (idf[ids] * tf * (k1 + 1.0) / (tf + norm[d])).astype(np.float32)
    return impact


@jax.jit
def bm25_scores_matmul(impact: jax.Array, qtf: jax.Array) -> jax.Array:
    """S [B, N] = qtf [B, V] @ impact [V, N] (f32 accumulate)."""
    return jnp.dot(qtf.astype(impact.dtype), impact,
                   preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def bm25_topk(impact: jax.Array, qtf: jax.Array, valid_n: jax.Array, k: int
              ) -> Tuple[jax.Array, jax.Array]:
    scores = bm25_scores_matmul(impact, qtf)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < valid_n, scores, -1e30)
    from legalrag_tpu.ops.topk import topk_large

    return topk_large(scores, k)


def query_term_counts(token_ids_batch: Sequence[Sequence[int]], vocab_size: int
                      ) -> np.ndarray:
    """Host: token-id lists (unknown tokens already dropped) → [B, V] counts."""
    q = np.zeros((len(token_ids_batch), vocab_size), np.float32)
    for i, ids in enumerate(token_ids_batch):
        for t in ids:
            q[i, t] += 1.0
    return q


def bm25_scores_oracle(doc_tokens: List[List[str]], query: List[str],
                       k1: float = 1.5, b: float = 0.75,
                       epsilon: float = 0.25) -> np.ndarray:
    """Pure-python reference scorer (the BM25Okapi algorithm verbatim) — used
    by tests as the numeric oracle and by nothing else."""
    n = len(doc_tokens)
    df: Dict[str, int] = {}
    for toks in doc_tokens:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    idf: Dict[str, float] = {}
    neg = []
    s = 0.0
    for w, f in df.items():
        v = math.log(n - f + 0.5) - math.log(f + 0.5)
        idf[w] = v
        s += v
        if v < 0:
            neg.append(w)
    avg = s / max(len(idf), 1)
    for w in neg:
        idf[w] = epsilon * avg
    doc_len = [len(t) for t in doc_tokens]
    avgdl = sum(doc_len) / max(n, 1)
    scores = np.zeros(n)
    for d, toks in enumerate(doc_tokens):
        tf: Dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        norm = k1 * (1 - b + b * doc_len[d] / avgdl)
        for qt in query:
            if qt in tf:
                f = tf[qt]
                scores[d] += idf[qt] * f * (k1 + 1) / (f + norm)
    return scores
