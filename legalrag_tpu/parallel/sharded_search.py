"""Multi-chip sharded search over a (data, model) mesh.

The scale-out design (SURVEY.md §2.11): corpus rows shard over the ``model``
axis (each chip owns a slice of every index artifact), query batches shard
over ``data``. A query computes shard-local scores + shard-local top-k, then
merges candidates across chips with ``all_gather`` over ICI — O(k·n_shards)
bytes on the interconnect instead of the full score matrix. This replaces
the reference's HTTP-microservice fan-out.

Implemented with ``shard_map`` so the collective schedule is explicit; XLA
overlaps the per-shard matmul with the gather.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from legalrag_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_sharded_dense_topk(mesh: Mesh, k: int):
    """Build a jitted sharded exact-search fn:
    (emb [N, d] sharded over model, q [B, d] sharded over data,
    valid_n replicated) → (scores [B, k], global row ids [B, k]), sharded
    over data."""

    def local(emb_local: jax.Array, q_local: jax.Array,
              valid_n: jax.Array) -> Tuple[jax.Array, jax.Array]:
        n_local = emb_local.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * n_local
        scores = jnp.dot(q_local.astype(emb_local.dtype), emb_local.T,
                         preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + offset
        scores = jnp.where(col < valid_n, scores, -1e30)
        kk = min(k, n_local)
        s, i = jax.lax.top_k(scores, kk)
        i = i + offset
        # merge candidates across the corpus shards (ICI all-gather)
        s_all = jax.lax.all_gather(s, MODEL_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, MODEL_AXIS, axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(s_all, min(k, s_all.shape[1]))
        top_i = jnp.take_along_axis(i_all, pos, axis=1)
        return top_s, top_i

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None), P()),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False)
    return jax.jit(fn)


def make_sharded_hybrid_step(mesh: Mesh, k: int, eff_k: int,
                             rrf_k: float = 60.0, alpha: float = 0.5,
                             w_dense: float = 0.6, w_bm25: float = 0.4):
    """Sharded dense + BM25 fused step: corpus rows and impact columns shard
    over ``model``; fusion (RRF + minmax blend over gathered candidates)
    happens on the data-sharded side. One jitted program; the multi-chip
    production query path."""

    def local(emb_local, impact_local, qvec_local, qtf_local, valid_n):
        n_local = emb_local.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * n_local
        kk = min(eff_k, n_local)

        def channel_topk(scores):
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + offset
            scores = jnp.where(col < valid_n, scores, -1e30)
            s, i = jax.lax.top_k(scores, kk)
            s_all = jax.lax.all_gather(s, MODEL_AXIS, axis=1, tiled=True)
            i_all = jax.lax.all_gather(i + offset, MODEL_AXIS, axis=1,
                                       tiled=True)
            top_s, pos = jax.lax.top_k(s_all, min(eff_k, s_all.shape[1]))
            return top_s, jnp.take_along_axis(i_all, pos, axis=1)

        d_s, d_i = channel_topk(jnp.dot(qvec_local.astype(emb_local.dtype),
                                        emb_local.T,
                                        preferred_element_type=jnp.float32))
        b_s, b_i = channel_topk(jnp.dot(qtf_local.astype(impact_local.dtype),
                                        impact_local.T,
                                        preferred_element_type=jnp.float32))

        # fuse the two gathered candidate lists (2·eff_k per query)
        def fuse_row(ds, di, bs, bi):
            ids = jnp.concatenate([di, bi])
            ranks = jnp.arange(1, ds.shape[0] + 1, dtype=jnp.float32)
            rrf = jnp.concatenate([w_dense / (rrf_k + ranks),
                                   w_bm25 / (rrf_k + ranks)])

            def minmax(s):
                lo, hi = jnp.min(s), jnp.max(s)
                return jnp.where(hi > lo, (s - lo) / jnp.maximum(hi - lo, 1e-12),
                                 jnp.ones_like(s))

            wsum = jnp.concatenate([w_dense * minmax(ds), w_bm25 * minmax(bs)])
            # merge duplicate ids: first occurrence accumulates both entries
            eq = ids[None, :] == ids[:, None]
            first = jnp.argmax(eq, axis=1) == jnp.arange(ids.shape[0])
            rrf_m = jnp.where(first, jnp.sum(jnp.where(eq, rrf[None, :], 0.0),
                                             axis=1), 0.0)
            wsum_m = jnp.where(first, jnp.sum(jnp.where(eq, wsum[None, :], 0.0),
                                              axis=1), 0.0)
            score = alpha * minmax(rrf_m) + (1 - alpha) * wsum_m
            score = jnp.where(first, score, -1e30)
            top_s, pos = jax.lax.top_k(score, min(k, score.shape[0]))
            return top_s, ids[pos]

        return jax.vmap(fuse_row)(d_s, d_i, b_s, b_i)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS, None),
                  P(DATA_AXIS, None), P(DATA_AXIS, None), P()),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False)
    return jax.jit(fn)


def shard_corpus_arrays(mesh: Mesh, emb, impact):
    """Place corpus arrays with their serving shardings (impact is [V, N] —
    sharded over docs, i.e. transposed to [N, V] rows first)."""
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P(MODEL_AXIS, None)))
    imp_sh = jax.device_put(impact, NamedSharding(mesh, P(MODEL_AXIS, None)))
    return emb_sh, imp_sh
