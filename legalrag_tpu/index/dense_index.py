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
        """Append [m, dim] float vectors (L2-normalized by the encoder).

        dtype "int8" stores the unit-int8 form ``round(127·e)`` (implicit
        global scale 1/127 — valid because rows are unit-norm, so every
        element is in [-1, 1]): HALF the bf16 HBM stream, and
        ``ops.topk.dense_scores`` runs the s8×s8→s32 scorer."""
        m = vectors.shape[0]
        if m == 0:
            return
        assert vectors.shape[1] == self.dim
        self._ensure_capacity(self.n + m)
        with on_device(self.device):
            if self.dtype == jnp.int8:
                v = np.clip(np.asarray(vectors, np.float32), -1.0, 1.0)
                vec = self._put(jnp.asarray(np.rint(v * 127.0), jnp.int8))
            else:
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
        # queries stay float: dense_scores owns the per-dtype cast (an
        # int8 store quantizes q per row inside the program)
        qdt = jnp.float32 if self.dtype == jnp.int8 else self.emb.dtype
        with on_device(self.device):
            s, i = dense_topk(self.emb, self._put(jnp.asarray(q, qdt)),
                              self.n, kb, backend=backend, tile_n=tile_n)
        return np.asarray(s)[:, :k], np.asarray(i)[:, :k]

    def score_rows(self, q: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """Inner products of one query [dim] against specific rows [m] —
        the graph-channel scorer (batched gather + dot on device)."""
        if len(rows) == 0:
            return np.zeros(0, np.float32)
        with on_device(self.device):
            emb_rows = jnp.take(self.emb, jnp.asarray(rows, jnp.int32), axis=0)
            if self.dtype == jnp.int8:
                s = jnp.dot(emb_rows.astype(jnp.float32) / 127.0,
                            jnp.asarray(q, jnp.float32),
                            preferred_element_type=jnp.float32)
            else:
                s = jnp.dot(emb_rows, jnp.asarray(q, self.emb.dtype),
                            preferred_element_type=jnp.float32)
        return np.asarray(s)

    # ------------------------------------------------------------- persist
    def save(self, path: str | Path) -> None:
        emb = np.asarray(self.emb[: self.n], np.float32) if self.n else \
            np.zeros((0, self.dim), np.float32)
        if self.dtype == jnp.int8:
            emb = emb / 127.0  # artifact format stays dtype-agnostic f16
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
