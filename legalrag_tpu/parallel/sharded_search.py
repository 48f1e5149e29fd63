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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from legalrag_tpu.ops.topk import dense_scores, topk_large
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
        scores = dense_scores(emb_local, q_local)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + offset
        scores = jnp.where(col < valid_n, scores, -1e30)
        kk = min(k, n_local)
        s, i = topk_large(scores, kk)   # two-pass past 131k rows per shard
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


def _gather_topk(scores: jax.Array, eff_k: int, offset,
                 valid_n) -> Tuple[jax.Array, jax.Array]:
    """Shard-local [B, n_local] scores → GLOBAL top-eff_k (scores, row ids).

    Shard-local top-k then an ``all_gather`` candidate merge over ICI is
    exact: the global top-eff_k is a subset of the union of per-shard
    top-eff_k lists. O(eff_k·n_shards) bytes on the interconnect."""
    kk = min(eff_k, scores.shape[1])
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + offset
    scores = jnp.where(col < valid_n, scores, -1e30)
    s, i = topk_large(scores, kk)       # two-pass past 131k rows per shard
    s_all = jax.lax.all_gather(s, MODEL_AXIS, axis=1, tiled=True)
    i_all = jax.lax.all_gather(i + offset, MODEL_AXIS, axis=1, tiled=True)
    top_s, pos = jax.lax.top_k(s_all, min(eff_k, s_all.shape[1]))
    return top_s, jnp.take_along_axis(i_all, pos, axis=1)


def _maxsim_local(doc_tok_l, doc_mask_l, q_tok, q_mask):
    """Per-shard full MaxSim with the same tile-budget rule as the
    single-device fused program (ops/fused_query.py)."""
    from legalrag_tpu.ops.maxsim import maxsim_full

    n_local = doc_tok_l.shape[0]
    b, lq = q_tok.shape[0], q_tok.shape[1]
    budget = (256 << 20) // 4
    tile = max(32, min(256, budget // max(b * lq * doc_tok_l.shape[1], 1)))
    while n_local % tile:
        tile //= 2
    return maxsim_full(doc_tok_l, doc_mask_l, q_tok, q_mask,
                       tile_n=max(tile, 1))


def make_sharded_hybrid_step(mesh: Mesh, k: int, eff_k: int,
                             rrf_k: float = 60.0, alpha: float = 0.5,
                             w_dense: float = 0.6, w_bm25: float = 0.4,
                             w_late: float = 0.35, has_late: bool = False):
    """Sharded fused step (dense + BM25 + optional MaxSim): corpus rows and
    impact columns shard over ``model``; fusion (RRF + minmax blend over
    gathered candidates) happens on the data-sharded side. One jitted
    program; the multi-chip throughput query path."""

    def local(emb_local, impact_local, doc_tok_l, doc_mask_l,
              qvec_local, qtf_local, q_tok_l, q_mask_l, valid_n):
        n_local = emb_local.shape[0]
        offset = jax.lax.axis_index(MODEL_AXIS) * n_local

        lists = [
            (w_dense, *_gather_topk(
                dense_scores(emb_local, qvec_local),
                eff_k, offset, valid_n)),
            (w_bm25, *_gather_topk(
                jnp.dot(qtf_local.astype(impact_local.dtype), impact_local.T,
                        preferred_element_type=jnp.float32),
                eff_k, offset, valid_n)),
        ]
        if has_late:
            lists.append((w_late, *_gather_topk(
                _maxsim_local(doc_tok_l, doc_mask_l, q_tok_l, q_mask_l),
                eff_k, offset, valid_n)))

        # fuse the gathered candidate lists (n_channels·eff_k per query)
        # with the SAME row kernel as the single-device large-corpus
        # program — the ranking math cannot diverge between the paths
        def fuse_row(*flat):
            from legalrag_tpu.ops.fused_query import fuse_candidate_lists

            per = [(w, s, i) for (w, _, _), s, i
                   in zip(lists, flat[0::2], flat[1::2])]
            n_cand = sum(s.shape[0] for _, s, _ in per)
            r = fuse_candidate_lists(per, rrf_k, alpha, min(k, n_cand))
            return r["top_s"], r["rows"]

        flat = []
        for _, s, i in lists:
            flat += [s, i]
        return jax.vmap(fuse_row)(*flat)

    tok_specs = ((P(MODEL_AXIS, None, None), P(MODEL_AXIS, None),
                  P(DATA_AXIS, None, None), P(DATA_AXIS, None))
                 if has_late else (P(), P(), P(), P()))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS, None), tok_specs[0],
                  tok_specs[1], P(DATA_AXIS, None), P(DATA_AXIS, None),
                  tok_specs[2], tok_specs[3], P()),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False)
    jitted = jax.jit(fn)
    if has_late:
        return jitted

    def without_late(emb, impact, qvec, qtf, valid_n):
        # host scalar, not a committed device array: multi-process meshes
        # cannot reshard process-local jax.Arrays (tests/multihost_worker.py)
        z = np.float32(0.0)
        return jitted(emb, impact, z, z, qvec, qtf, z, z, valid_n)

    return without_late


_CHANNELS_CACHE: dict = {}


def _channels_shardmap(mesh: Mesh, eff_k: int, has_late: bool):
    """The (un-jitted) shard_map'd per-channel step shared by the plain and
    encoder-fused sharded serving programs."""

    def local(emb_l, impact_l, doc_tok_l, doc_mask_l, qvec,
              term_ids, term_mask, q_tok, q_mask, valid_n):
        n_local = emb_l.shape[0]
        offset = jax.lax.axis_index(MODEL_AXIS) * n_local

        dense = _gather_topk(dense_scores(emb_l, qvec),
                             eff_k, offset, valid_n)
        b, v = term_ids.shape[0], impact_l.shape[0]
        qtf = jnp.zeros((b, v), jnp.float32).at[
            jnp.arange(b)[:, None], term_ids].add(
            term_mask.astype(jnp.float32))
        bm25 = _gather_topk(
            jnp.dot(qtf.astype(impact_l.dtype), impact_l,
                    preferred_element_type=jnp.float32),
            eff_k, offset, valid_n)
        if not has_late:
            return dense, bm25
        late = _gather_topk(
            _maxsim_local(doc_tok_l, doc_mask_l, q_tok, q_mask),
            eff_k, offset, valid_n)
        return dense, bm25, late

    pair = (P(), P())
    tok_specs = ((P(MODEL_AXIS, None, None), P(MODEL_AXIS, None))
                 if has_late else (P(), P()))
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(None, MODEL_AXIS),
                  tok_specs[0], tok_specs[1], P(), P(), P(), P(), P(), P()),
        out_specs=(pair, pair, pair) if has_late else (pair, pair),
        check_vma=False)


def make_sharded_channels_step(mesh: Mesh, eff_k: int, has_late: bool):
    """Multi-chip analogue of ``ops.fused_query.fused_channels_topk``: every
    channel's GLOBAL top-eff_k list from one sharded execution.

    This is the multi-chip SERVING path: the returned per-channel candidate
    lists are exactly the single-device ones (shard-local top-k + all_gather
    merge is exact), so the host-side fusion → min-score → graph → rerank →
    dedup pipeline downstream is untouched — full 6-stage parity with
    ``HybridRetriever.search`` on a sharded corpus.

    Queries are replicated (single-query serving; use
    ``make_sharded_hybrid_step`` for data-parallel batched throughput).
    """
    jitted = jax.jit(_channels_shardmap(mesh, eff_k, has_late))

    def run(emb, impact, doc_tok, doc_mask, qvec, qtf_pair, q_tok, q_mask,
            valid_n):
        if not has_late:
            z = np.float32(0.0)
            doc_tok = doc_mask = q_tok = q_mask = z
        return jitted(emb, impact, doc_tok, doc_mask, qvec, qtf_pair[0],
                      qtf_pair[1], q_tok, q_mask, valid_n)

    return run


def make_sharded_bert_channels_step(mesh: Mesh, eff_k: int, has_late: bool,
                                    bcfg, token_dim: int, q_dtype):
    """Encoder-fused sharded serving step (VERDICT r2 #4): the replicated
    BERT query forward runs INSIDE the same jitted program as the sharded
    channel searches, so sharded+bert serving is ONE device execution per
    batch — the same dispatch economics the unsharded one-shot program
    measured at 7.5× on remote backends (EVAL.md: 342 → 2,570 q/s).

    The encoder stage consumes replicated token ids and produces replicated
    query views (it is O(B·L·H) — tiny next to the sharded corpus work);
    the shard_map'd channel step then reads them with ``P()`` in-specs.
    Exactness vs encode-then-search is tested (same ``bert_query_views``
    math as the separate calls). Replaces the reference's encode→search
    split at ``hybrid_retriever.py:282-384``."""
    from legalrag_tpu.models.bert import bert_query_views

    step = _channels_shardmap(mesh, eff_k, has_late)

    @functools.partial(jax.jit, static_argnames=())
    def run(params, proj, ids_q, mask_q, ids_t, mask_t, emb, impact,
            doc_tok, doc_mask, term_ids, term_mask, valid_n):
        qvec, q_tok = bert_query_views(
            params, bcfg, proj, token_dim, ids_q, mask_q,
            ids_t if has_late else None, mask_t if has_late else None)
        if not has_late:
            z = jnp.zeros((), jnp.float32)
            return (*step(emb, impact, z, z, qvec, term_ids, term_mask,
                          z, z, valid_n), qvec)
        q_tok = q_tok.astype(q_dtype)
        q_mask = mask_t.astype(bool)
        return (*step(emb, impact, doc_tok, doc_mask, qvec, term_ids,
                      term_mask, q_tok, q_mask, valid_n), qvec)

    return run


def sharded_channels_topk(mesh: Mesh, eff_k: int, emb, impact,
                          doc_tok, doc_mask, qvec, qtf_pair, q_tok, q_mask,
                          valid_n):
    """Dict-shaped facade matching ``fused_channels_topk``'s output:
    ``{"qvec": [B,d], "dense": (s,i), "bm25": (s,i)[, "colbert": (s,i)]}``.

    ``qvec`` may be ready embeddings or the hash backend's
    (sketch, projection) pair — projected + L2-normalized here (replicated;
    it is O(B·d))."""
    if isinstance(qvec, (tuple, list)):
        sketch, proj = qvec
        qvec = jnp.dot(sketch, proj, preferred_element_type=jnp.float32)
        qvec = qvec / jnp.maximum(
            jnp.linalg.norm(qvec, axis=-1, keepdims=True), 1e-9)
    has_late = doc_tok is not None
    key = (mesh, eff_k, has_late)
    step = _CHANNELS_CACHE.get(key)
    if step is None:
        step = _CHANNELS_CACHE[key] = make_sharded_channels_step(
            mesh, eff_k, has_late)
    res = step(emb, impact, doc_tok, doc_mask, qvec, qtf_pair, q_tok, q_mask,
               valid_n)
    out = {"qvec": qvec, "dense": res[0], "bm25": res[1]}
    if has_late:
        out["colbert"] = res[2]
    return out


def shard_corpus_arrays(mesh: Mesh, emb, impact):
    """Place corpus arrays with their serving shardings (impact is [V, N] —
    sharded over docs, i.e. transposed to [N, V] rows first)."""
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P(MODEL_AXIS, None)))
    imp_sh = jax.device_put(impact, NamedSharding(mesh, P(MODEL_AXIS, None)))
    return emb_sh, imp_sh
