"""Device-resident token-embedding index for late interaction.

Replaces the ColBERT/PLAID compressed index (reference
``colbert_builder.py:119-134``) with a padded+masked [N, L, dt] store scored
by ``ops.maxsim``. Storage dtypes: bf16 (default) or int8 (symmetric
unit-norm quantization, dequantized inside the score producers — half the
HBM for large corpora, SURVEY.md §7.4.5); queries always stay float.
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

    @property
    def _query_dtype(self):
        """Query tokens stay float even over an int8 store (quantizing the
        query would destroy the similarity scale)."""
        return jnp.float32 if self.dtype == jnp.int8 else self.dtype

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

    def _quantize(self, token_emb: np.ndarray) -> np.ndarray:
        if self.dtype == jnp.int8:
            from legalrag_tpu.ops.maxsim import INT8_SCALE

            return np.clip(np.round(token_emb * INT8_SCALE),
                           -127, 127).astype(np.int8)
        return token_emb

    def add(self, token_emb: np.ndarray, token_mask: np.ndarray) -> None:
        """Append [m, L, dt] per-token embeddings with [m, L] validity mask.
        With ``dtype="int8"`` vectors quantize symmetrically (unit-norm ·127)."""
        m = token_emb.shape[0]
        if m == 0:
            return
        assert token_emb.shape[1:] == (self.doc_maxlen, self.token_dim)
        self._ensure_capacity(self.n + m)
        token_emb = self._quantize(token_emb)
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
                                  self._put(jnp.asarray(q_tok, self._query_dtype)),
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
                               self._put(jnp.asarray(q_tok, self._query_dtype)),
                               self._put(jnp.asarray(q_mask, bool)),
                               self.n, kb, tile_n=min(tile_n, self.capacity))
        return np.asarray(s)[:, :k], np.asarray(i)[:, :k]

    # -------------------------------------------------------------- persist
    def save(self, path: str | Path) -> None:
        is_int8 = self.dtype == jnp.int8
        if self.n:
            tok = np.asarray(self.tok[: self.n])
            tok = tok if is_int8 else tok.astype(np.float16)
            mask = np.asarray(self.mask[: self.n])
        else:
            tok = np.zeros((0, self.doc_maxlen, self.token_dim),
                           np.int8 if is_int8 else np.float16)
            mask = np.zeros((0, self.doc_maxlen), bool)
        np.savez_compressed(path, tok=tok, mask=mask,
                            token_dim=self.token_dim,
                            doc_maxlen=self.doc_maxlen,
                            quantized=np.bool_(is_int8))

    @classmethod
    def load(cls, path: str | Path, dtype: str = "bfloat16",
             capacity_round: int = 1024, device=None) -> "TokenIndex":
        z = np.load(path)
        stored_int8 = bool(z["quantized"]) if "quantized" in z.files else False
        if stored_int8:
            dtype = "int8"
        idx = cls(int(z["token_dim"]), int(z["doc_maxlen"]), dtype=dtype,
                  capacity_round=capacity_round, device=device)
        tok = z["tok"]
        if stored_int8 and idx.dtype == jnp.int8:
            # already-quantized payload: bypass requantization
            m = tok.shape[0]
            idx._ensure_capacity(m)
            with on_device(idx.device):
                idx.tok = jax.lax.dynamic_update_slice(
                    idx.tok, idx._put(jnp.asarray(tok, jnp.int8)), (0, 0, 0))
                idx.mask = jax.lax.dynamic_update_slice(
                    idx.mask, idx._put(jnp.asarray(z["mask"], bool)), (0, 0))
            idx.n = m
        else:
            idx.add(tok.astype(np.float32), z["mask"])
        return idx
