"""Late-interaction MaxSim scoring (the ColBERT-channel analogue).

Replaces the Stanford ColBERT/PLAID native search (reference
``colbert_retriever.py:139-183``) with device-resident token embeddings
[N, L, dt] (bf16, padded + masked) and a batched MaxSim:

    score(q, d) = Σ_{i ∈ q tokens} max_{j ∈ d tokens} (q_i · d_j)

Two modes (SURVEY.md §7.2 step 7):
- candidate mode: score only [B, C] pre-filtered candidates (gathered from
  HBM) — the default two-phase flow, dense-prefilter → exact MaxSim;
- full-corpus mode: score all N docs (exact late-interaction retrieval),
  tiled so the [B, N, Lq] intermediate never materializes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


INT8_SCALE = 127.0


class Residual4Store(NamedTuple):
    """PLAID-class nbits=4 residual-compressed token store (reference
    ``colbert_builder.py:119-134`` builds the torch equivalent).

    Token ≈ centroids[codes_c] + unpack4(packed) · (scales / 7).
    Memory per token: 1 + dt/2 bytes vs 2·dt (bf16) — ~4× compression.
    ``packed`` holds two signed 4-bit residual codes per byte
    (dim 2k → high nibble, 2k+1 → low nibble, biased by +8)."""

    codes_c: jax.Array    # [N, L] uint8 centroid ids (K ≤ 256)
    packed: jax.Array     # [N, L, dt//2] uint8 packed residual nibbles
    centroids: jax.Array  # [K, dt] f32
    scales: jax.Array     # [dt] f32 per-dim residual scale


def n_docs(store) -> int:
    return store.codes_c.shape[0] if isinstance(store, Residual4Store) \
        else store.shape[0]


def doc_len(store) -> int:
    return store.codes_c.shape[1] if isinstance(store, Residual4Store) \
        else store.shape[1]


def _gather_docs(store, rows):
    if isinstance(store, Residual4Store):
        return Residual4Store(store.codes_c[rows], store.packed[rows],
                              store.centroids, store.scales)
    return store[rows]


def _slice_docs(store, start, size):
    if isinstance(store, Residual4Store):
        return Residual4Store(
            jax.lax.dynamic_slice_in_dim(store.codes_c, start, size, 0),
            jax.lax.dynamic_slice_in_dim(store.packed, start, size, 0),
            store.centroids, store.scales)
    return jax.lax.dynamic_slice_in_dim(store, start, size, 0)


def _dequant(x) -> jax.Array:
    """Dequantize a token tile on the fly inside the einsum producer:
    int8 stores hold round(v·127) of unit-norm vectors; Residual4Store
    reconstructs centroid + 4-bit residual (SURVEY.md §7.4.5)."""
    if isinstance(x, Residual4Store):
        hi = jnp.right_shift(x.packed, 4).astype(jnp.int32) - 8
        lo = (x.packed & 0xF).astype(jnp.int32) - 8
        codes = jnp.stack([hi, lo], axis=-1).reshape(
            x.packed.shape[:-1] + (2 * x.packed.shape[-1],))
        res = codes.astype(jnp.float32) * (x.scales / 7.0)
        return jnp.take(x.centroids, x.codes_c.astype(jnp.int32), axis=0) + res
    if x.dtype == jnp.int8:
        return x.astype(jnp.float32) * (1.0 / INT8_SCALE)
    return x


@functools.partial(jax.jit, static_argnames=())
def maxsim_candidates(doc_tok: jax.Array, doc_mask: jax.Array,
                      q_tok: jax.Array, q_mask: jax.Array,
                      cand: jax.Array) -> jax.Array:
    """MaxSim scores for per-query candidate lists.

    doc_tok [N, L, dt], doc_mask [N, L] bool, q_tok [B, Lq, dt],
    q_mask [B, Lq] bool, cand [B, C] int32 → [B, C] f32.
    """

    def per_query(qt, qm, cd):
        dt = _dequant(_gather_docs(doc_tok, cd))  # [C, L, d]
        dm = doc_mask[cd]                         # [C, L]
        sim = jnp.einsum("qd,cld->cql", qt, dt,
                         preferred_element_type=jnp.float32)
        sim = jnp.where(dm[:, None, :], sim, -jnp.inf)
        best = jnp.max(sim, axis=-1)            # [C, Lq]
        best = jnp.where(qm[None, :], best, 0.0)
        best = jnp.where(jnp.isfinite(best), best, 0.0)  # empty doc guard
        return jnp.sum(best, axis=-1)           # [C]

    return jax.lax.map(lambda args: per_query(*args), (q_tok, q_mask, cand))


@functools.partial(jax.jit, static_argnames=("tile_n",))
def maxsim_full(doc_tok: jax.Array, doc_mask: jax.Array,
                q_tok: jax.Array, q_mask: jax.Array,
                tile_n: int = 256) -> jax.Array:
    """Exact full-corpus MaxSim → [B, N] f32, tiled over the doc axis."""
    n = n_docs(doc_tok)
    assert n % tile_n == 0, "pad N to tile_n"
    num_tiles = n // tile_n

    def tile_body(i, acc):
        dt = _dequant(_slice_docs(doc_tok, i * tile_n, tile_n))
        dm = jax.lax.dynamic_slice_in_dim(doc_mask, i * tile_n, tile_n, 0)
        sim = jnp.einsum("bqd,cld->bcql", q_tok, dt,
                         preferred_element_type=jnp.float32)
        sim = jnp.where(dm[None, :, None, :], sim, -jnp.inf)
        best = jnp.max(sim, axis=-1)                        # [B, C, Lq]
        best = jnp.where(q_mask[:, None, :], best, 0.0)
        best = jnp.where(jnp.isfinite(best), best, 0.0)
        scores = jnp.sum(best, axis=-1)                     # [B, C]
        return jax.lax.dynamic_update_slice_in_dim(acc, scores, i * tile_n, 1)

    b = q_tok.shape[0]
    init = jnp.zeros((b, n), jnp.float32)
    return jax.lax.fori_loop(0, num_tiles, tile_body, init)


def maxsim_topk(doc_tok, doc_mask, q_tok, q_mask, valid_n, k: int,
                tile_n: int = 256) -> Tuple[jax.Array, jax.Array]:
    from legalrag_tpu.ops.topk import topk_large

    scores = maxsim_full(doc_tok, doc_mask, q_tok, q_mask, tile_n=tile_n)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < jnp.asarray(valid_n, jnp.int32), scores, -1e30)
    return topk_large(scores, min(k, scores.shape[1]))
