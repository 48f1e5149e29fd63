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

    def dequantized_rows(self, start: int, stop: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Host f32 values of rows [start, stop) (int8 stores rescale by
        1/127, mirroring ``ops.maxsim._dequant``). Uniform across token
        index classes so eval tooling never branches on storage dtype."""
        stop = min(stop, self.capacity)
        tok = np.asarray(self.tok[start:stop], np.float32)
        if self.dtype == jnp.int8:
            tok *= 1.0 / 127.0
        return tok, np.asarray(self.mask[start:stop])

    def dequantized(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.dequantized_rows(0, self.capacity)

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
        if "packed" in z.files:  # nbit4 payloads are sticky, like int8
            return Residual4TokenIndex.load(path, capacity_round=capacity_round,
                                            device=device)
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


# ---------------------------------------------------------------------------
# PLAID-class nbits=4 residual compression

class Residual4TokenIndex:
    """Token store compressed PLAID-style (reference
    ``colbert_builder.py:119-134`` builds nbits=4 residual indexes): each
    token = nearest of K centroids + per-dim 4-bit residual code. Memory per
    token: 1 + dt/2 bytes vs 2·dt bf16 (~4×); dequantization happens inside
    the MaxSim score producers (``ops.maxsim.Residual4Store``), so the
    channel contract is unchanged. Select with ``engine.token_dtype="nbit4"``.
    """

    K = 256
    TRAIN_SAMPLE = 65536
    KMEANS_ITERS = 8

    def __init__(self, token_dim: int, doc_maxlen: int = 220,
                 dtype: str = "nbit4", capacity_round: int = 1024,
                 device=None):
        assert token_dim % 2 == 0, "nbit4 packs two dims per byte"
        self.token_dim = token_dim
        self.doc_maxlen = doc_maxlen
        self.dtype = "nbit4"
        self.capacity_round = capacity_round
        self.device = device
        self.n = 0
        self.codes_c: Optional[jax.Array] = None   # [cap, L] uint8
        self.packed: Optional[jax.Array] = None    # [cap, L, dt//2] uint8
        self.mask: Optional[jax.Array] = None      # [cap, L] bool
        self.centroids: Optional[np.ndarray] = None  # [K, dt] f32 (host copy)
        self.scales: Optional[np.ndarray] = None     # [dt] f32
        self._centroids_dev = None
        self._scales_dev = None

    # ------------------------------------------------------------ properties
    @property
    def capacity(self) -> int:
        return 0 if self.codes_c is None else self.codes_c.shape[0]

    @property
    def _query_dtype(self):
        return jnp.float32

    @property
    def tok(self):
        """The device store in the form the score producers consume."""
        from legalrag_tpu.ops.maxsim import Residual4Store

        if self.codes_c is None:
            return None
        return Residual4Store(self.codes_c, self.packed,
                              self._centroids_dev, self._scales_dev)

    def _put(self, x):
        return jax.device_put(x, self.device) if self.device is not None \
            else jnp.asarray(x)

    # -------------------------------------------------------------- training
    def _train(self, token_emb: np.ndarray, token_mask: np.ndarray) -> None:
        """Minibatch-free k-means over a token sample + robust per-dim
        residual scales (99.5th percentile of |residual|)."""
        flat = token_emb.reshape(-1, self.token_dim)[
            token_mask.reshape(-1).astype(bool)]
        if flat.shape[0] == 0:
            flat = np.zeros((1, self.token_dim), np.float32)
        rng = np.random.default_rng(0)
        if flat.shape[0] > self.TRAIN_SAMPLE:
            flat = flat[rng.choice(flat.shape[0], self.TRAIN_SAMPLE,
                                   replace=False)]
        k = min(self.K, flat.shape[0])
        cent = flat[rng.choice(flat.shape[0], k, replace=False)].astype(
            np.float32).copy()
        for _ in range(self.KMEANS_ITERS):
            assign = np.argmax(flat @ cent.T - 0.5 * (cent ** 2).sum(1), 1)
            for c in range(k):
                sel = assign == c
                if sel.any():
                    cent[c] = flat[sel].mean(0)
        if k < self.K:  # pad to K so shapes stay static
            cent = np.concatenate([cent, np.tile(cent[-1:],
                                                 (self.K - k, 1))], 0)
        res = flat - cent[np.argmax(flat @ cent.T
                                    - 0.5 * (cent ** 2).sum(1), 1)]
        scales = np.quantile(np.abs(res), 0.995, axis=0).astype(np.float32)
        self.centroids = cent.astype(np.float32)
        self.scales = np.maximum(scales, 1e-6)
        self._centroids_dev = self._put(self.centroids)
        self._scales_dev = self._put(self.scales)

    def _encode(self, token_emb: np.ndarray):
        """[m, L, dt] → (codes_c uint8 [m, L], packed uint8 [m, L, dt//2]).
        Chunked: the [tokens, K] assignment sims would be tens of GB at
        corpus scale."""
        m = token_emb.shape[0]
        flat = np.asarray(token_emb, np.float32).reshape(
            -1, self.token_dim)
        half_norms = 0.5 * (self.centroids ** 2).sum(1)
        codes_c = np.empty(flat.shape[0], np.uint8)
        packed = np.empty((flat.shape[0], self.token_dim // 2), np.uint8)
        # Preallocated scratch reused across chunks with out= everywhere:
        # freed multi-hundred-MB temporaries are returned to the OS and
        # refaulted at ~20 MB/s on this image, which made the naive loop
        # ~10× slower than the arithmetic itself.
        step = 1 << 19
        cT = np.ascontiguousarray(self.centroids.T)
        sims = np.empty((step, cT.shape[1]), np.float32)
        res = np.empty((step, self.token_dim), np.float32)
        cen = np.empty((step, self.token_dim), np.float32)
        inv_scale = 7.0 / self.scales
        for s in range(0, flat.shape[0], step):
            chunk = flat[s:s + step]
            b = chunk.shape[0]
            np.matmul(chunk, cT, out=sims[:b])
            sims[:b] -= half_norms
            cc = np.argmax(sims[:b], 1)
            np.take(self.centroids, cc, axis=0, out=cen[:b])
            np.subtract(chunk, cen[:b], out=res[:b])
            res[:b] *= inv_scale
            np.round(res[:b], out=res[:b])
            np.clip(res[:b], -8, 7, out=res[:b])
            res[:b] += 8
            q = res[:b].astype(np.uint8)
            codes_c[s:s + step] = cc.astype(np.uint8)
            packed[s:s + step] = (q[:, 0::2] << 4) | q[:, 1::2]
        return (codes_c.reshape(m, self.doc_maxlen),
                packed.reshape(m, self.doc_maxlen, self.token_dim // 2))

    # ------------------------------------------------------------------- add
    def _ensure_capacity(self, need: int) -> None:
        if need <= self.capacity:
            return
        with on_device(self.device):
            cap = _round_up(need, self.capacity_round)
            cc = jnp.zeros((cap, self.doc_maxlen), jnp.uint8)
            pk = jnp.zeros((cap, self.doc_maxlen, self.token_dim // 2),
                           jnp.uint8)
            mk = jnp.zeros((cap, self.doc_maxlen), bool)
            if self.codes_c is not None and self.n:
                cc = jax.lax.dynamic_update_slice(cc, self.codes_c[: self.n],
                                                  (0, 0))
                pk = jax.lax.dynamic_update_slice(pk, self.packed[: self.n],
                                                  (0, 0, 0))
                mk = jax.lax.dynamic_update_slice(mk, self.mask[: self.n],
                                                  (0, 0))
            self.codes_c, self.packed, self.mask = (
                self._put(cc), self._put(pk), self._put(mk))

    def add(self, token_emb: np.ndarray, token_mask: np.ndarray) -> None:
        m = token_emb.shape[0]
        if m == 0:
            return
        assert token_emb.shape[1:] == (self.doc_maxlen, self.token_dim)
        if self.centroids is None:
            self._train(np.asarray(token_emb, np.float32),
                        np.asarray(token_mask))
        codes_c, packed = self._encode(np.asarray(token_emb, np.float32))
        self._ensure_capacity(self.n + m)
        with on_device(self.device):
            self.codes_c = jax.lax.dynamic_update_slice(
                self.codes_c, self._put(codes_c), (self.n, 0))
            self.packed = jax.lax.dynamic_update_slice(
                self.packed, self._put(packed), (self.n, 0, 0))
            self.mask = jax.lax.dynamic_update_slice(
                self.mask, self._put(jnp.asarray(token_mask, bool)),
                (self.n, 0))
        self.n += m

    # ----------------------------------------------------------------- score
    def score_candidates(self, q_tok: np.ndarray, q_mask: np.ndarray,
                         cand: np.ndarray) -> np.ndarray:
        with on_device(self.device):
            s = maxsim_candidates(self.tok, self.mask,
                                  self._put(jnp.asarray(q_tok, jnp.float32)),
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
                               self._put(jnp.asarray(q_tok, jnp.float32)),
                               self._put(jnp.asarray(q_mask, bool)),
                               self.n, kb, tile_n=min(tile_n, self.capacity))
        return np.asarray(s)[:, :k], np.asarray(i)[:, :k]

    def dequantized_rows(self, start: int, stop: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Host f32 reconstruction of rows [start, stop) — pure NumPy
        (mirrors ``ops.maxsim._dequant`` bit-for-bit) so callers can
        rebuild slice-by-slice without materializing the full store on
        any device (sharding ships one slice per shard)."""
        stop = min(stop, self.capacity)
        cc = np.asarray(self.codes_c[start:stop])
        pk = np.asarray(self.packed[start:stop]).astype(np.int32)
        q = np.empty(cc.shape + (self.token_dim,), np.float32)
        q[..., 0::2] = (pk >> 4) - 8
        q[..., 1::2] = (pk & 0xF) - 8
        tok = self.centroids[cc] + q * (self.scales / 7.0)
        return tok.astype(np.float32), np.asarray(self.mask[start:stop])

    def dequantized(self) -> Tuple[np.ndarray, np.ndarray]:
        """Host f32 reconstruction (eval tooling; prefer
        ``dequantized_rows`` at scale)."""
        return self.dequantized_rows(0, self.capacity)

    @property
    def nbytes(self) -> int:
        if self.codes_c is None:
            return 0
        return (self.codes_c.size + self.packed.size
                + self.centroids.nbytes + self.scales.nbytes)

    # -------------------------------------------------------------- persist
    def save(self, path: str | Path) -> None:
        if self.n:
            cc = np.asarray(self.codes_c[: self.n])
            pk = np.asarray(self.packed[: self.n])
            mk = np.asarray(self.mask[: self.n])
        else:
            cc = np.zeros((0, self.doc_maxlen), np.uint8)
            pk = np.zeros((0, self.doc_maxlen, self.token_dim // 2), np.uint8)
            mk = np.zeros((0, self.doc_maxlen), bool)
        np.savez_compressed(
            path, codes_c=cc, packed=pk, mask=mk,
            centroids=self.centroids if self.centroids is not None
            else np.zeros((self.K, self.token_dim), np.float32),
            scales=self.scales if self.scales is not None
            else np.ones(self.token_dim, np.float32),
            token_dim=self.token_dim, doc_maxlen=self.doc_maxlen)

    @classmethod
    def load(cls, path: str | Path, dtype: str = "nbit4",
             capacity_round: int = 1024, device=None) -> "Residual4TokenIndex":
        z = np.load(path)
        idx = cls(int(z["token_dim"]), int(z["doc_maxlen"]),
                  capacity_round=capacity_round, device=device)
        idx.centroids = z["centroids"].astype(np.float32)
        idx.scales = z["scales"].astype(np.float32)
        idx._centroids_dev = idx._put(idx.centroids)
        idx._scales_dev = idx._put(idx.scales)
        m = z["codes_c"].shape[0]
        if m:
            idx._ensure_capacity(m)
            with on_device(idx.device):
                idx.codes_c = jax.lax.dynamic_update_slice(
                    idx.codes_c, idx._put(jnp.asarray(z["codes_c"])), (0, 0))
                idx.packed = jax.lax.dynamic_update_slice(
                    idx.packed, idx._put(jnp.asarray(z["packed"])), (0, 0, 0))
                idx.mask = jax.lax.dynamic_update_slice(
                    idx.mask, idx._put(jnp.asarray(z["mask"], bool)), (0, 0))
            idx.n = m
        return idx
