"""Fused hybrid query: all channels + fusion + final top-k in ONE program.

The serving fast path (SURVEY.md §7.1): a query batch enters as three device
arrays (dense query vectors, BM25 term-count vectors, query token
embeddings) and one jitted program produces the fused top-k — dense matmul,
BM25 impact matmul, tiled MaxSim, per-channel top-k candidate semantics,
RRF + min-max blend (``rrf_norm_blend``), final top-k. No host round-trips
between channels; XLA fuses the elementwise fusion math into the score
producers.

Ranking semantics are the reference's (``hybrid_retriever.py:389-551``) and
are tested for agreement against the host-side ``retrieval.fusion.fuse``:
per-channel rank over its top-``eff_k`` candidates (1-based), RRF
contribution ``w/(rrf_k + rank)``, per-channel min-max over the retrieved
set, blend ``α·minmax(rrf_total) + (1−α)·Σ w·minmax(s)``, non-candidates
excluded.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from legalrag_tpu.ops.maxsim import doc_len as _doc_len, maxsim_full
from legalrag_tpu.ops.topk import NEG_INF, dense_scores, topk_large


class FusedParams(NamedTuple):
    eff_k: int
    final_k: int
    rrf_k: float
    alpha: float
    w_dense: float
    w_bm25: float
    w_late: float
    # large-corpus mode: score MaxSim only on this many dense-prefiltered
    # candidates (0 = full-corpus exact late interaction)
    late_candidates: int = 0
    # sparse BM25 gather budget (used when impact arrives as CSR arrays)
    max_postings: int = 16384
    # large-corpus mode: write the [B, N] dense score map in bf16 (half
    # the dominant HBM stream); winners are rescored exactly in f32
    # (ops/topk.py dense_topk_2pass map_bf16 semantics)
    dense_map_bf16: bool = False


def _channel_components(scores: jax.Array, eff_k: int, weight: float,
                        rrf_k: float) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-channel candidate mask / weighted-RRF map / weighted-minmax map,
    all [B, N] with zeros outside the channel's top-eff_k."""
    b, n = scores.shape
    eff_k = min(eff_k, n)
    top_s, top_i = jax.lax.top_k(scores, eff_k)
    valid = top_s > NEG_INF / 2
    ranks = jnp.arange(1, eff_k + 1, dtype=jnp.float32)[None, :]
    rrf = jnp.where(valid, weight / (rrf_k + ranks), 0.0)
    lo = jnp.min(jnp.where(valid, top_s, jnp.inf), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(valid, top_s, -jnp.inf), axis=1, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-12)
    norm = jnp.where(valid, jnp.where(hi > lo, (top_s - lo) / span, 1.0), 0.0)

    def scatter(vals):
        out = jnp.zeros((b, n), jnp.float32)
        return jax.vmap(lambda o, i, v: o.at[i].set(v))(out, top_i, vals)

    mask = scatter(valid.astype(jnp.float32))
    return mask, scatter(rrf), scatter(weight * norm)


@functools.partial(jax.jit, static_argnames=("params",))
def fused_hybrid_topk(emb: jax.Array, impact: jax.Array,
                      doc_tok: Optional[jax.Array], doc_mask: Optional[jax.Array],
                      qvec: jax.Array, qtf: jax.Array,
                      q_tok: Optional[jax.Array], q_mask: Optional[jax.Array],
                      valid_n: jax.Array, params: FusedParams
                      ) -> Dict[str, jax.Array]:
    """Returns final top-k rows plus per-channel score maps gathered at the
    returned rows (for host-side breakdown assembly).

    ``qtf`` may be either a dense [B, V] count matrix or a pair
    (term_ids [B, L] int32, term_mask [B, L]) — the id form transfers KBs
    instead of MBs and the count matrix is scattered on device (measured:
    the dense-qtf host→HBM copy dominated serving latency at small corpora).

    ``qvec`` may be either ready [B, d] query embeddings or a pair
    (sketch [B, D0], projection [D0, d]) — folding the hash-encoder
    projection into this program removes a separate per-batch execution
    (remote backends serialize on interleaved transfer/execute).
    """
    n = emb.shape[0]
    if isinstance(qvec, (tuple, list)):
        sketch, proj = qvec
        qvec = jnp.dot(sketch, proj, preferred_element_type=jnp.float32)
        qvec = qvec / jnp.maximum(
            jnp.linalg.norm(qvec, axis=-1, keepdims=True), 1e-9)
    sparse_bm25 = isinstance(impact, (tuple, list)) and len(impact) == 3
    if isinstance(qtf, (tuple, list)) and not sparse_bm25:
        term_ids, term_mask = qtf
        b = term_ids.shape[0]
        v = impact.shape[0]
        qtf = jnp.zeros((b, v), jnp.float32).at[
            jnp.arange(b)[:, None], term_ids].add(
            term_mask.astype(jnp.float32))

    def mask_invalid(s):
        # channels may pad the doc axis differently; align to the dense
        # capacity n and mask capacity rows
        if s.shape[1] < n:
            s = jnp.pad(s, ((0, 0), (0, n - s.shape[1])),
                        constant_values=NEG_INF)
        elif s.shape[1] > n:
            s = s[:, :n]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        return jnp.where(col < valid_n, s, NEG_INF)

    if sparse_bm25:
        # large-corpus mode: CSR postings + candidate-LIST fusion — no
        # [B, N] fusion maps and NO scatters (XLA scatter-add serializes on
        # TPU and dominated this program; measured). qtf must be the
        # (term_ids, term_counts) pair. The dense map stays RAW here — the
        # full-map validity mask is an extra read+write of the program's
        # biggest tensor; selection masks at block granularity instead
        # (ops/topk.py topk_2pass_masked).
        if params.dense_map_bf16 and emb.dtype != jnp.int8:
            raw = jnp.dot(qvec.astype(jnp.bfloat16),
                          emb.astype(jnp.bfloat16).T,
                          preferred_element_type=jnp.bfloat16)
        else:
            raw = dense_scores(emb, qvec)
        return _fused_lists(raw, valid_n, emb, qvec, impact, doc_tok,
                            doc_mask, qtf, q_tok, q_mask, params)
    dense_s = mask_invalid(dense_scores(emb, qvec))
    bm25_s = mask_invalid(jnp.dot(qtf.astype(impact.dtype), impact,
                                  preferred_element_type=jnp.float32))

    channels = [(dense_s, params.w_dense), (bm25_s, params.w_bm25)]
    late_s = None
    if doc_tok is not None and params.late_candidates > 0:
        # candidate mode: exact MaxSim on dense-prefiltered rows, scattered
        # back to the [B, N] map (rank semantics: rank within candidates)
        from legalrag_tpu.ops.maxsim import maxsim_candidates

        c = min(params.late_candidates, n)
        _, cand = topk_large(dense_s, c)
        cand_scores = maxsim_candidates(doc_tok, doc_mask, q_tok, q_mask,
                                        cand)
        b = dense_s.shape[0]
        late_s = jnp.full((b, n), NEG_INF, jnp.float32)
        late_s = jax.vmap(lambda m, i, v: m.at[i].set(v))(late_s, cand,
                                                          cand_scores)
        late_s = mask_invalid(late_s)
        channels.append((late_s, params.w_late))
    elif doc_tok is not None:
        # cap the [B, tile, Lq, L] similarity intermediate at ~256 MB f32
        b, lq = q_tok.shape[0], q_tok.shape[1]
        l_doc = _doc_len(doc_tok)
        budget = (256 << 20) // 4
        tile = max(32, min(256, budget // max(b * lq * l_doc, 1)))
        while n % tile:
            tile //= 2
        late_s = mask_invalid(maxsim_full(doc_tok, doc_mask, q_tok, q_mask,
                                          tile_n=max(tile, 1)))
        channels.append((late_s, params.w_late))

    cand = jnp.zeros(dense_s.shape, jnp.float32)
    rrf_total = jnp.zeros(dense_s.shape, jnp.float32)
    weighted_sum = jnp.zeros(dense_s.shape, jnp.float32)
    for scores, weight in channels:
        m, rrf, wnorm = _channel_components(scores, params.eff_k, weight,
                                            params.rrf_k)
        cand = jnp.maximum(cand, m)
        rrf_total = rrf_total + rrf
        weighted_sum = weighted_sum + wnorm

    is_cand = cand > 0
    lo = jnp.min(jnp.where(is_cand, rrf_total, jnp.inf), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(is_cand, rrf_total, -jnp.inf), axis=1, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-12)
    rrf_norm = jnp.where(is_cand,
                         jnp.where(hi > lo, (rrf_total - lo) / span, 1.0), 0.0)
    final = jnp.where(is_cand,
                      params.alpha * rrf_norm + (1 - params.alpha) * weighted_sum,
                      NEG_INF)
    top_s, top_i = jax.lax.top_k(final, min(params.final_k, n))

    # pack every f32 component into ONE tensor: host fetches are per-buffer
    # round trips on remote backends (measured ~25 ms each), so the output
    # is exactly two arrays — rows + packed components.
    gather = lambda s: jnp.take_along_axis(s, top_i, axis=1)
    comps = [top_s, gather(dense_s), gather(bm25_s), gather(rrf_norm),
             gather(weighted_sum)]
    if late_s is not None:
        comps.append(gather(late_s))
    return {"rows": top_i, "packed": jnp.stack(comps, axis=-1)}


# packed-component order along the last axis of ``packed`` (colbert present
# only when the late channel ran)
PACKED_NAMES = ("scores", "dense", "bm25", "rrf_norm", "weighted_sum",
                "colbert")


def fuse_candidate_lists(per, rrf_k: float, alpha: float, final_k: int):
    """ONE row of candidate-list fusion, shared by the single-device
    large-corpus program (``_fused_lists``) and the sharded step
    (``parallel.sharded_search``) so the ranking math cannot diverge.

    ``per`` is a list of ``(weight, scores[k_ch], ids[k_ch])`` per channel
    (lists may have different lengths; invalid slots carry ``NEG_INF``).
    Each list contributes RRF at its own in-list rank and weighted
    min-max-normalized scores; duplicate ids merge onto their first valid
    occurrence (reference fusion semantics, ``hybrid_retriever.py:389-551``).
    Returns top_s/rows plus the intermediates callers need for
    explainability components. Callers vmap this over the batch."""
    ids = jnp.concatenate([i for _, _, i in per])
    valid = jnp.concatenate([s > NEG_INF / 2 for _, s, _ in per])
    rrf = jnp.where(valid, jnp.concatenate(
        [w / (rrf_k + jnp.arange(1, s.shape[0] + 1, dtype=jnp.float32))
         for w, s, _ in per]), 0.0)

    def minmax(s, v):
        lo = jnp.min(jnp.where(v, s, jnp.inf))
        hi = jnp.max(jnp.where(v, s, -jnp.inf))
        norm = jnp.where(hi > lo,
                         (s - lo) / jnp.maximum(hi - lo, 1e-12), 1.0)
        return jnp.where(v, norm, 0.0)

    norms = jnp.concatenate([w * minmax(s, s > NEG_INF / 2)
                             for w, s, _ in per])
    eq = (ids[None, :] == ids[:, None]) & valid[None, :] & valid[:, None]
    first = (jnp.argmax(eq, axis=1) == jnp.arange(ids.shape[0])) & valid
    rrf_m = jnp.where(first, jnp.sum(jnp.where(eq, rrf[None, :], 0.0),
                                     axis=1), 0.0)
    wsum_m = jnp.where(first, jnp.sum(jnp.where(eq, norms[None, :], 0.0),
                                      axis=1), 0.0)
    rrf_n = minmax(rrf_m, first)
    score = jnp.where(first,
                      alpha * rrf_n + (1 - alpha) * wsum_m, NEG_INF)
    top_s, pos = jax.lax.top_k(score, final_k)
    return {"top_s": top_s, "rows": ids[pos], "pos": pos,
            "rrf_n": rrf_n, "wsum_m": wsum_m}


def _fused_lists(dense_s, valid_n, emb, qvec, sparse_impact, doc_tok,
                 doc_mask, qtf_pair, q_tok, q_mask, params: FusedParams):
    """Candidate-list fusion for the large-corpus mode: every channel
    contributes a top-eff_k (scores, ids) LIST; fusion (RRF + min-max blend)
    runs over the concatenated lists per query — the only [B, N]-sized
    tensor in the program is the dense matmul output. List semantics match
    the reference host fusion (channels contribute components only for docs
    in their own top list, ``hybrid_retriever.py:389-551``) with one
    deliberate divergence: a channel with fewer than eff_k positive-score
    docs contributes only its REAL matches — the map path (and reference)
    pads with arbitrary zero-score docs, which shifts min-max statistics by
    ~1e-3 in that starved regime and never occurs at production scale."""
    from legalrag_tpu.ops.bm25_sparse import bm25_sparse_topk_auto
    from legalrag_tpu.ops.topk import TWO_PASS_MIN_N, topk_2pass_masked

    n = dense_s.shape[1]
    eff_k = min(params.eff_k, n)
    offsets, post_docs, post_w = sparse_impact
    term_ids, term_counts = qtf_pair

    wide = n >= TWO_PASS_MIN_N
    if not wide:
        col = jax.lax.broadcasted_iota(jnp.int32, dense_s.shape, 1)
        dense_masked = jnp.where(col < valid_n, dense_s,
                                 jnp.asarray(NEG_INF, dense_s.dtype))

    def dsel(kk):
        if wide:
            return topk_2pass_masked(dense_s, valid_n, kk)
        return jax.lax.top_k(dense_masked, kk)

    d_s, d_i = dsel(eff_k)
    if dense_s.dtype == jnp.bfloat16:
        # bf16 map: rescore the winners exactly in f32 (B·eff_k·d gather
        # — trivial next to the map itself) so fusion min-max statistics
        # stay full precision
        rows = jnp.take(emb, d_i, axis=0).astype(jnp.float32)
        # same operand rounding as dense_scores (q cast to the storage
        # dtype before the product) so rescored values match the f32-map
        # program bit-for-bit up to accumulation order
        qf = qvec.astype(emb.dtype).astype(jnp.float32)
        exact = jnp.einsum("bd,bkd->bk", qf, rows)
        d_s = jnp.where(d_s.astype(jnp.float32) > NEG_INF / 2, exact,
                        NEG_INF)
        order = jnp.argsort(-d_s, axis=1)
        d_s = jnp.take_along_axis(d_s, order, axis=1)
        d_i = jnp.take_along_axis(d_i, order, axis=1)
    b_s, b_i = bm25_sparse_topk_auto(
        term_ids, term_counts.astype(jnp.int32), offsets, post_docs, post_w,
        eff_k, max_postings=params.max_postings)
    lists = [(params.w_dense, d_s, d_i), (params.w_bm25, b_s, b_i)]
    if doc_tok is not None:
        from legalrag_tpu.ops.maxsim import maxsim_candidates

        c = min(params.late_candidates or 128, n)
        cand = d_i[:, :c] if c <= eff_k else dsel(c)[1]
        cand_scores = maxsim_candidates(doc_tok, doc_mask, q_tok, q_mask,
                                        cand)
        l_s, pos = jax.lax.top_k(cand_scores, min(eff_k, c))
        l_i = jnp.take_along_axis(cand, pos, axis=1)
        lists.append((params.w_late, l_s, l_i))

    final_k = min(params.final_k, n)

    def fuse_row(*flat):
        per = [(w, s, i) for (w, _, _), s, i
               in zip(lists, flat[0::2], flat[1::2])]
        r = fuse_candidate_lists(per, params.rrf_k, params.alpha, final_k)
        top_s, rows, pos = r["top_s"], r["rows"], r["pos"]

        def lookup(s_list, i_list):
            hit = (rows[:, None] == i_list[None, :]) \
                & (s_list[None, :] > NEG_INF / 2)
            val = jnp.max(jnp.where(hit, s_list[None, :], NEG_INF), axis=1)
            return jnp.where(val > NEG_INF / 2, val, 0.0)

        comps = [top_s, lookup(per[0][1], per[0][2]),
                 lookup(per[1][1], per[1][2]),
                 r["rrf_n"][pos], r["wsum_m"][pos]]
        if len(per) > 2:
            comps.append(lookup(per[2][1], per[2][2]))
        return rows, jnp.stack(comps, axis=-1)

    flat = []
    for _, s, i in lists:
        flat += [s, i]
    rows, packed = jax.vmap(fuse_row)(*flat)
    return {"rows": rows, "packed": packed}


@functools.partial(jax.jit, static_argnames=("eff_k",))
def fused_channels_topk(emb: jax.Array, impact: jax.Array,
                        doc_tok: Optional[jax.Array],
                        doc_mask: Optional[jax.Array],
                        qvec: jax.Array, qtf,
                        q_tok: Optional[jax.Array],
                        q_mask: Optional[jax.Array],
                        valid_n: jax.Array, eff_k: int) -> Dict[str, Tuple]:
    """Per-channel top-eff_k lists from ONE execution.

    The single-query serving path (``HybridRetriever``) needs each channel's
    own candidate list for reference-exact host fusion + explainability;
    running the channels as separate programs costs one tunnel round trip
    each (~70 ms on remote backends). This program computes all channel
    score maps and their top-k in one launch; fusion stays on the host,
    byte-identical to the per-channel path.

    Accepts the same flexible ``qvec`` (array or (sketch, projection)) and
    ``qtf`` (dense counts or (term_ids, term_mask)) forms as
    ``fused_hybrid_topk``.
    """
    n = emb.shape[0]
    if isinstance(qvec, (tuple, list)):
        sketch, proj = qvec
        qvec = jnp.dot(sketch, proj, preferred_element_type=jnp.float32)
        qvec = qvec / jnp.maximum(
            jnp.linalg.norm(qvec, axis=-1, keepdims=True), 1e-9)
    if isinstance(qtf, (tuple, list)):
        term_ids, term_mask = qtf
        b = term_ids.shape[0]
        qtf = jnp.zeros((b, impact.shape[0]), jnp.float32).at[
            jnp.arange(b)[:, None], term_ids].add(
            term_mask.astype(jnp.float32))

    def mask_invalid(s):
        if s.shape[1] < n:
            s = jnp.pad(s, ((0, 0), (0, n - s.shape[1])),
                        constant_values=NEG_INF)
        elif s.shape[1] > n:
            s = s[:, :n]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        return jnp.where(col < valid_n, s, NEG_INF)

    k = min(eff_k, n)
    out: Dict[str, Tuple] = {"qvec": qvec}
    dense_s = mask_invalid(dense_scores(emb, qvec))
    out["dense"] = topk_large(dense_s, k)
    bm25_s = mask_invalid(jnp.dot(qtf.astype(impact.dtype), impact,
                                  preferred_element_type=jnp.float32))
    out["bm25"] = topk_large(bm25_s, k)
    if doc_tok is not None:
        b, lq = q_tok.shape[0], q_tok.shape[1]
        budget = (256 << 20) // 4
        tile = max(32, min(256, budget // max(b * lq * _doc_len(doc_tok), 1)))
        while n % tile:
            tile //= 2
        late_s = mask_invalid(maxsim_full(doc_tok, doc_mask, q_tok, q_mask,
                                          tile_n=max(tile, 1)))
        out["colbert"] = topk_large(late_s, k)
    return out
