"""Device-resident token-embedding index for late interaction.

Replaces the ColBERT/PLAID compressed index (reference
``colbert_builder.py:119-134``) with a padded+masked [N, L, dt] bf16 store
scored by ``ops.maxsim``. No residual compression in v1 — at statute-corpus
scale the store fits HBM comfortably; int8 quantization is the planned
follow-up for large corpora (SURVEY.md §7.4.5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.ops.maxsim import maxsim_candidates, maxsim_topk
from legalrag_tpu.utils.device import on_device


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class TokenIndex:
    def __init__(self, token_dim: int, doc_maxlen: int = 220,
                 dtype: str = "bfloat16", capacity_round: int = 1024,
                 device=None):
        self.token_dim = token_dim
        self.doc_maxlen = doc_maxlen
        self.dtype = jnp.dtype(dtype)
        self.capacity_round = capacity_round
        self.device = device
        self.n = 0
        self.tok: Optional[jax.Array] = None   # [cap, L, dt]
        self.mask: Optional[jax.Array] = None  # [cap, L] bool

    @property
    def capacity(self) -> int:
        return 0 if self.tok is None else self.tok.shape[0]

    def _put(self, x):
        return jax.device_put(x, self.device) if self.device is not None else jnp.asarray(x)

    def _ensure_capacity(self, need: int) -> None:
        if need <= self.capacity:
            return
        with on_device(self.device):
            cap = _round_up(need, self.capacity_round)
            tok = jnp.zeros((cap, self.doc_maxlen, self.token_dim), self.dtype)
            mask = jnp.zeros((cap, self.doc_maxlen), bool)
            if self.tok is not None and self.n:
                tok = jax.lax.dynamic_update_slice(tok, self.tok[: self.n], (0, 0, 0))
                mask = jax.lax.dynamic_update_slice(mask, self.mask[: self.n], (0, 0))
            self.tok, self.mask = self._put(tok), self._put(mask)

    def add(self, token_emb: np.ndarray, token_mask: np.ndarray) -> None:
        """Append [m, L, dt] per-token embeddings with [m, L] validity mask."""
        m = token_emb.shape[0]
        if m == 0:
            return
        assert token_emb.shape[1:] == (self.doc_maxlen, self.token_dim)
        self._ensure_capacity(self.n + m)
        with on_device(self.device):
            self.tok = jax.lax.dynamic_update_slice(
                self.tok, self._put(jnp.asarray(token_emb, self.dtype)), (self.n, 0, 0))
            self.mask = jax.lax.dynamic_update_slice(
                self.mask, self._put(jnp.asarray(token_mask, bool)), (self.n, 0))
        self.n += m

    # ---------------------------------------------------------------- score
    def score_candidates(self, q_tok: np.ndarray, q_mask: np.ndarray,
                         cand: np.ndarray) -> np.ndarray:
        """[B, Lq, dt] query tokens × [B, C] candidate rows → [B, C] scores."""
        with on_device(self.device):
            s = maxsim_candidates(self.tok, self.mask,
                                  self._put(jnp.asarray(q_tok, self.dtype)),
                                  self._put(jnp.asarray(q_mask, bool)),
                                  self._put(jnp.asarray(cand, jnp.int32)))
        return np.asarray(s)

    def topk(self, q_tok: np.ndarray, q_mask: np.ndarray, k: int,
             tile_n: int = 128) -> Tuple[np.ndarray, np.ndarray]:
        if self.n == 0:
            b = q_tok.shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        from legalrag_tpu.ops.topk import bucket_k

        k = min(k, self.n)
        kb = bucket_k(k, self.capacity)
        with on_device(self.device):
            s, i = maxsim_topk(self.tok, self.mask,
                               self._put(jnp.asarray(q_tok, self.dtype)),
                               self._put(jnp.asarray(q_mask, bool)),
                               self.n, kb, tile_n=min(tile_n, self.capacity))
        return np.asarray(s)[:, :k], np.asarray(i)[:, :k]

    # -------------------------------------------------------------- persist
    def save(self, path: str | Path) -> None:
        tok = (np.asarray(self.tok[: self.n], np.float32) if self.n
               else np.zeros((0, self.doc_maxlen, self.token_dim), np.float32))
        mask = (np.asarray(self.mask[: self.n]) if self.n
                else np.zeros((0, self.doc_maxlen), bool))
        np.savez_compressed(path, tok=tok.astype(np.float16), mask=mask,
                            token_dim=self.token_dim, doc_maxlen=self.doc_maxlen)

    @classmethod
    def load(cls, path: str | Path, dtype: str = "bfloat16",
             capacity_round: int = 1024, device=None) -> "TokenIndex":
        z = np.load(path)
        idx = cls(int(z["token_dim"]), int(z["doc_maxlen"]), dtype=dtype,
                  capacity_round=capacity_round, device=device)
        idx.add(z["tok"].astype(np.float32), z["mask"])
        return idx
