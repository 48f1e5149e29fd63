"""HBM-resident dense index.

Replaces FAISS ``IndexHNSWFlat`` (reference ``faiss_builder.py:79-91``,
``vector_store.py:112-118``) with an exact device matmul + fused top-k
(``ops.topk``). Capacity is pre-allocated and rounded (static shapes under
jit); incremental adds fill rows in place and only reallocate — one
recompile — when capacity is exceeded (SURVEY.md §7.2 step 4, §7.4.3).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.ops.topk import dense_topk
from legalrag_tpu.utils.device import on_device


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class DenseIndex:
    def __init__(self, dim: int, dtype: str = "bfloat16",
                 capacity_round: int = 1024, device=None):
        self.dim = dim
        self.dtype = jnp.dtype(dtype)
        self.capacity_round = capacity_round
        self.device = device
        self.n = 0
        self.emb: Optional[jax.Array] = None  # [cap, dim]

    @property
    def capacity(self) -> int:
        return 0 if self.emb is None else self.emb.shape[0]

    def _put(self, x):
        return jax.device_put(x, self.device) if self.device is not None else jnp.asarray(x)

    def _ensure_capacity(self, need: int) -> None:
        if need <= self.capacity:
            return
        with on_device(self.device):
            cap = _round_up(need, self.capacity_round)
            new = jnp.zeros((cap, self.dim), self.dtype)
            if self.emb is not None and self.n:
                new = jax.lax.dynamic_update_slice(new, self.emb[: self.n], (0, 0))
            self.emb = self._put(new)

    def add(self, vectors: np.ndarray) -> None:
        """Append [m, dim] float vectors (L2-normalized by the encoder)."""
        m = vectors.shape[0]
        if m == 0:
            return
        assert vectors.shape[1] == self.dim
        self._ensure_capacity(self.n + m)
        with on_device(self.device):
            vec = self._put(jnp.asarray(vectors, self.dtype))
            self.emb = jax.lax.dynamic_update_slice(self.emb, vec, (self.n, 0))
        self.n += m

    def topk(self, q: np.ndarray, k: int, backend: str = "auto",
             tile_n: int = 512) -> Tuple[np.ndarray, np.ndarray]:
        """[B, dim] queries → (scores [B, k], row ids [B, k]) on host."""
        if self.n == 0:
            b = q.shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        from legalrag_tpu.ops.topk import bucket_k

        k = min(k, self.n)
        kb = bucket_k(k, self.capacity)
        with on_device(self.device):
            s, i = dense_topk(self.emb, self._put(jnp.asarray(q, self.emb.dtype)),
                              self.n, kb, backend=backend, tile_n=tile_n)
        return np.asarray(s)[:, :k], np.asarray(i)[:, :k]

    def score_rows(self, q: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """Inner products of one query [dim] against specific rows [m] —
        the graph-channel scorer (batched gather + dot on device)."""
        if len(rows) == 0:
            return np.zeros(0, np.float32)
        with on_device(self.device):
            emb_rows = jnp.take(self.emb, jnp.asarray(rows, jnp.int32), axis=0)
            s = jnp.dot(emb_rows, jnp.asarray(q, self.emb.dtype),
                        preferred_element_type=jnp.float32)
        return np.asarray(s)

    # ------------------------------------------------------------- persist
    def save(self, path: str | Path) -> None:
        emb = np.asarray(self.emb[: self.n], np.float32) if self.n else \
            np.zeros((0, self.dim), np.float32)
        np.savez_compressed(path, emb=emb.astype(np.float16),
                            dim=self.dim, n=self.n)

    @classmethod
    def load(cls, path: str | Path, dtype: str = "bfloat16",
             capacity_round: int = 1024, device=None) -> "DenseIndex":
        z = np.load(path)
        idx = cls(int(z["dim"]), dtype=dtype, capacity_round=capacity_round,
                  device=device)
        idx.add(z["emb"].astype(np.float32))
        return idx
