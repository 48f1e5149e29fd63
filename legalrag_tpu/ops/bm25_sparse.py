"""Sparse BM25 scoring over device-resident CSR postings (Pallas kernel).

The impact-matrix path (``ops.bm25``) is exact and MXU-fast but its [V, N]
dense matrix grows as vocab × docs — beyond ~10⁵ docs the memory bill is
unacceptable. This kernel scores from the *sparse* postings directly:

- device arrays: ``post_docs`` int32 [NNZ] (doc ids, term-major),
  ``post_w`` f32 [NNZ] (precomputed per-(term,doc) BM25 contributions),
  ``offsets`` int32 [V+1] (CSR term boundaries);
- a query is its padded term-id list; the kernel walks each term's postings
  in fixed-size chunks (DMA from HBM into VMEM scratch, double-buffer-ready)
  and scatter-accumulates contributions into a VMEM score accumulator.

Grid: one program per query row. Term count and chunk size are static;
postings lengths are dynamic (``fori_loop`` with a data-dependent bound).
Numeric parity with the impact path is tested (same precomputed weights).

Backend status: the Pallas kernel validates in interpret mode; the Mosaic
TC lowering on this image's TPU backend does not yet implement scatter-add
(verified on hardware), so ``bm25_sparse_scores_auto`` routes TPUs through
``bm25_sparse_scores_xla`` — the same CSR arrays scored with XLA's native
scatter (device-resident, one fused program) — until the Mosaic gap closes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legalrag_tpu.ops.topk import NEG_INF


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


def _bm25_sparse_kernel(term_ids_ref, term_counts_ref, offsets_ref,
                        post_docs_ref, post_w_ref, out_ref, acc_ref,
                        docs_vmem, w_vmem, sem, *, chunk: int, max_terms: int):
    """One query row: accumulate postings contributions into acc [1, N]."""
    qi = pl.program_id(0)  # scalar-prefetch refs hold the FULL [B, L] arrays
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def term_body(t, _):
        tid = term_ids_ref[qi, t]
        count = term_counts_ref[qi, t].astype(jnp.float32)
        start = offsets_ref[tid]
        end = offsets_ref[tid + 1]
        size = end - start

        def chunk_body(c, _):
            base = start + c * chunk
            copy_d = pltpu.make_async_copy(
                post_docs_ref.at[pl.ds(base, chunk)], docs_vmem, sem.at[0])
            copy_w = pltpu.make_async_copy(
                post_w_ref.at[pl.ds(base, chunk)], w_vmem, sem.at[1])
            copy_d.start()
            copy_w.start()
            copy_d.wait()
            copy_w.wait()
            idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
            valid = idx < (size - c * chunk)
            docs = docs_vmem[...]
            w = jnp.where(valid, w_vmem[...] * count, 0.0)
            row = acc_ref[0, :]
            acc_ref[0, :] = row.at[docs].add(w, mode="drop")
            return 0

        n_chunks = jnp.maximum(0, (size + chunk - 1) // chunk)
        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        return 0

    jax.lax.fori_loop(0, max_terms, term_body, 0)
    out_ref[0, ...] = acc_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("n_docs_pad", "chunk", "interpret"))
def bm25_sparse_scores(term_ids: jax.Array, term_counts: jax.Array,
                       offsets: jax.Array, post_docs: jax.Array,
                       post_w: jax.Array, n_docs_pad: int, chunk: int = 512,
                       interpret: bool = False) -> jax.Array:
    """[B, L] padded query term ids/counts → [B, n_docs_pad] BM25 scores.

    ``chunk`` must not exceed the chunk ``build_postings`` padded with
    (default 512): the kernel windows each term's postings from its raw
    offset, so the tail window over-reads up to chunk-1 slots into the
    builder's padding headroom."""
    b, max_terms = term_ids.shape
    if post_docs.shape[0] % chunk != 0:
        raise ValueError(
            f"postings length {post_docs.shape[0]} is not a multiple of "
            f"chunk={chunk}; use the chunk build_postings was built with")
    kernel = functools.partial(_bm25_sparse_kernel, chunk=chunk,
                               max_terms=max_terms)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # term_ids, term_counts, offsets
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # post_docs (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # post_w (HBM)
        ],
        # out is [b, 1, n_pad] so the per-program block's trailing two dims
        # (1, n_pad) match the overall array (Mosaic tiling constraint)
        out_specs=pl.BlockSpec((1, 1, n_docs_pad), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n_docs_pad), jnp.float32),
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, n_docs_pad), jnp.float32),
        interpret=interpret,
    )(term_ids.reshape(b, max_terms), term_counts.reshape(b, max_terms),
      offsets, post_docs, post_w)
    return out.reshape(b, n_docs_pad)


@functools.partial(jax.jit, static_argnames=("n_docs_pad", "max_postings"))
def bm25_sparse_scores_xla(term_ids: jax.Array, term_counts: jax.Array,
                           offsets: jax.Array, post_docs: jax.Array,
                           post_w: jax.Array, n_docs_pad: int,
                           max_postings: int = 16384) -> jax.Array:
    """XLA scatter-add variant of the sparse path (TPU-lowerable today).

    Per query: gather up to ``max_postings`` postings across its terms with
    a static-shape two-level gather (term slot × within-term position, both
    padded), then one ``scatter-add`` into the [n_docs_pad] score vector.
    Terms whose postings exceed the per-term budget are truncated — size the
    budget to the corpus' max document frequency for exactness.
    """
    b, max_terms = term_ids.shape
    per_term = max_postings // max_terms

    def one_query(ids, counts):
        starts = offsets[ids]                       # [T]
        sizes = offsets[ids + 1] - starts           # [T]
        pos = jnp.arange(per_term)[None, :]         # [1, P]
        gather_idx = starts[:, None] + pos          # [T, P]
        valid = (pos < sizes[:, None]) & (counts[:, None] > 0)
        docs = post_docs[gather_idx]
        w = post_w[gather_idx] * counts[:, None].astype(jnp.float32)
        w = jnp.where(valid, w, 0.0)
        return jnp.zeros(n_docs_pad, jnp.float32).at[docs.ravel()].add(w.ravel())

    return jax.vmap(one_query)(term_ids, term_counts)


def _gather_postings(ids, counts, offsets, post_docs, post_w, per_term,
                     sentinel):
    """CSR gather front-end shared by the sorted/merge top-k paths:
    [T] term ids/counts → ([T, P] doc ids with sentinel pads, [T, P]
    contribution weights)."""
    starts = offsets[ids]
    sizes = offsets[ids + 1] - starts
    pos = jnp.arange(per_term)[None, :]
    gather_idx = starts[:, None] + pos
    valid = (pos < sizes[:, None]) & (counts[:, None] > 0)
    docs = jnp.where(valid, post_docs[gather_idx], sentinel)
    w = jnp.where(valid,
                  post_w[gather_idx] * counts[:, None].astype(jnp.float32),
                  0.0)
    return docs, w


def _segment_topk(docs_s, w_s, k, sentinel):
    """Doc-id-sorted postings → per-doc segment totals → top-k.

    The segment-start prefix propagates by cummax over each segment's
    first POSITION (monotone by construction), then a gather — exact for
    ANY weight sign. (Propagating the prefix VALUES by cummax would
    silently under-count when contributions are negative, which the
    epsilon-floored idf produces on degenerate corpora whose mean raw idf
    is negative.)"""
    cum = jnp.cumsum(w_s)
    n = docs_s.shape[0]
    is_last = docs_s != jnp.concatenate(
        [docs_s[1:], jnp.full((1,), -1, docs_s.dtype)])
    is_first = docs_s != jnp.concatenate(
        [jnp.full((1,), -1, docs_s.dtype), docs_s[:-1]])
    prev_cum = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    first_idx = jax.lax.cummax(
        jnp.where(is_first, jnp.arange(n, dtype=jnp.int32), -1))
    seg_total = cum - prev_cum[first_idx]  # position 0 is always a first
    score = jnp.where(is_last & (docs_s < sentinel), seg_total, -1e30)
    s, i = jax.lax.top_k(score, k)
    return s.astype(jnp.float32), docs_s[i]


@functools.partial(jax.jit, static_argnames=("k", "max_postings"))
def bm25_sparse_topk_sorted(term_ids: jax.Array, term_counts: jax.Array,
                            offsets: jax.Array, post_docs: jax.Array,
                            post_w: jax.Array, k: int,
                            max_postings: int = 16384
                            ) -> Tuple[jax.Array, jax.Array]:
    """Scatter-FREE sparse BM25 top-k: (scores [B, k], doc ids [B, k]).

    XLA's scatter-add serializes on TPU (measured: it dominated the whole
    large-corpus fused program). This formulation uses only TPU-fast dense
    ops: gather postings (static two-level index), ``lax.sort`` pairs by
    doc id, segment-sum via cumsum + first-position cummax propagation,
    segment totals at last positions, ``lax.top_k``. No [B, N] score map
    is materialized — candidates only (absent docs simply aren't
    candidates, matching the reference's list-based fusion).
    """
    b, max_terms = term_ids.shape
    per_term = max_postings // max_terms
    sentinel = jnp.int32(2 ** 30)

    def one_query(ids, counts):
        docs, w = _gather_postings(ids, counts, offsets, post_docs, post_w,
                                   per_term, sentinel)
        docs_s, w_s = jax.lax.sort((docs.ravel(), w.ravel()), num_keys=1)
        return _segment_topk(docs_s, w_s, k, sentinel)

    return jax.vmap(one_query)(term_ids, term_counts)


def _bitonic_merge_pairs(keys: jax.Array, vals: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
    """[G, 2, L] pairs of ASCENDING-sorted rows → [G, 2L] sorted merges.

    concat(a, reverse(b)) is bitonic; log2(2L) butterfly compare-exchange
    stages finish the merge — the payload permutes with the keys. Pure
    reshape/min/where ops: XLA fuses each stage into one VPU pass."""
    g, _, l = keys.shape
    ks = jnp.concatenate([keys[:, 0, :], keys[:, 1, ::-1]], axis=-1)
    vs = jnp.concatenate([vals[:, 0, :], vals[:, 1, ::-1]], axis=-1)
    span = l
    while span >= 1:
        k4 = ks.reshape(g, -1, 2, span)
        v4 = vs.reshape(g, -1, 2, span)
        swap = k4[:, :, 0, :] > k4[:, :, 1, :]
        k_lo = jnp.where(swap, k4[:, :, 1, :], k4[:, :, 0, :])
        k_hi = jnp.where(swap, k4[:, :, 0, :], k4[:, :, 1, :])
        v_lo = jnp.where(swap, v4[:, :, 1, :], v4[:, :, 0, :])
        v_hi = jnp.where(swap, v4[:, :, 0, :], v4[:, :, 1, :])
        ks = jnp.stack([k_lo, k_hi], axis=2).reshape(g, 2 * l)
        vs = jnp.stack([v_lo, v_hi], axis=2).reshape(g, 2 * l)
        span //= 2
    return ks, vs


def bm25_sparse_topk_merge(term_ids: jax.Array, term_counts: jax.Array,
                           offsets: jax.Array, post_docs: jax.Array,
                           post_w: jax.Array, k: int,
                           max_postings: int = 16384
                           ) -> Tuple[jax.Array, jax.Array]:
    """Sorted-segment BM25 top-k with a MERGE NETWORK instead of a full
    sort.

    ``bm25_sparse_topk_sorted`` bitonic-sorts all M gathered postings
    (~log²M stages) — but each term's posting slice arrives ALREADY
    sorted by doc id (builder invariant), so a log2(T)-level pairwise
    bitonic merge reaches the same sorted order in sum(log2 L_i) ≈ half
    the stages, each a fused VPU pass over [B, M]. Everything after the
    sort (cumsum segment totals, last-position emission, top-k) is shared
    with the sorted path; results are identical (same summation order).

    Requires per_term (= max_postings // max_terms) to be a power of two
    and max_terms >= 2; callers route through ``bm25_sparse_topk_sorted``
    otherwise."""
    b, max_terms = term_ids.shape
    per_term = max_postings // max_terms
    t_pad = 1 << (max_terms - 1).bit_length()     # pow2 merge tree
    if per_term & (per_term - 1) or max_terms < 2:
        raise ValueError(
            f"merge path needs power-of-two per_term>=1 and max_terms>=2 "
            f"(got per_term={per_term}, max_terms={max_terms})")
    sentinel = jnp.int32(2 ** 30)

    def one_query(ids, counts):
        docs, w = _gather_postings(ids, counts, offsets, post_docs, post_w,
                                   per_term, sentinel)
        if t_pad != max_terms:                    # sentinel-only blocks
            docs = jnp.concatenate(
                [docs, jnp.full((t_pad - max_terms, per_term), sentinel,
                                docs.dtype)])
            w = jnp.concatenate(
                [w, jnp.zeros((t_pad - max_terms, per_term), w.dtype)])
        while docs.shape[0] > 1:                  # log2(T) merge levels
            g = docs.shape[0] // 2
            docs, w = _bitonic_merge_pairs(
                docs.reshape(g, 2, -1), w.reshape(g, 2, -1))
        return _segment_topk(docs[0], w[0], k, sentinel)

    return jax.vmap(one_query)(term_ids, term_counts)


def bm25_sparse_topk_auto(term_ids: jax.Array, term_counts: jax.Array,
                          offsets: jax.Array, post_docs: jax.Array,
                          post_w: jax.Array, k: int,
                          max_postings: int = 16384
                          ) -> Tuple[jax.Array, jax.Array]:
    """Route the sparse top-k by geometry: the merge network (measured 2.0x
    the full sort at the production 32x2048 geometry on v5e,
    ``scripts.bench_bm25``) when per_term is a power of two, else the
    full-sort path."""
    _, t = term_ids.shape
    per_term = max_postings // max(t, 1)
    if t >= 2 and per_term >= 1 and per_term & (per_term - 1) == 0:
        return bm25_sparse_topk_merge(term_ids, term_counts, offsets,
                                      post_docs, post_w, k, max_postings)
    return bm25_sparse_topk_sorted(term_ids, term_counts, offsets,
                                   post_docs, post_w, k, max_postings)


def bm25_sparse_topk_eq(term_ids: jax.Array, term_counts: jax.Array,
                        offsets: jax.Array, post_docs: jax.Array,
                        post_w: jax.Array, k: int,
                        max_postings: int = 16384, chunk: int = 1024
                        ) -> Tuple[jax.Array, jax.Array]:
    """SORT-free sparse BM25 top-k via equality contraction.

    Same CSR gather front-end as ``bm25_sparse_topk_sorted``; instead of
    sorting the M gathered postings to segment-sum duplicate docs (the
    bitonic sort dominated the million-doc fused program: 1M breakdown
    measured the sorted stage at ~2x the rest of the program combined),
    each candidate's total is a contraction against the whole gathered
    list:

        score(c) = sum_j [docs[j] == docs[c]] * w[j]

    The [C, M] equality operand is generated on the fly and consumed by
    two dots — an f32 matvec for exact totals, and a bf16 [M, T]
    block-indicator matmul whose f32-accumulated (exact small-integer)
    counts locate each doc's FIRST containing query term. A candidate
    survives dedup iff it sits in that first term's block (within a
    term's postings doc ids are unique), so every doc appears exactly
    once, matching the sorted path's last-position emission. No sort, no
    scatter — compare + matmul only, the two things this hardware does
    at full rate. Totals match the sorted path modulo f32 summation
    order (parity-tested).

    Replaces the same reference search as ``bm25_sparse_topk_sorted``
    (rank_bm25 ``get_scores`` + argsort, reference
    ``keyword_store.py``); routing between the two is measured
    (``scripts.bench_bm25``)."""
    b, max_terms = term_ids.shape
    per_term = max_postings // max_terms
    m = per_term * max_terms
    chunk = min(chunk, m)
    while m % chunk:
        chunk //= 2
    sentinel = jnp.int32(2 ** 30)
    # block indicator: posting slot j belongs to query-term block j//per_term
    ind = (jnp.arange(m)[:, None] // per_term
           == jnp.arange(max_terms)[None, :]).astype(jnp.bfloat16)

    def one_query(ids, counts):
        starts = offsets[ids]
        sizes = offsets[ids + 1] - starts
        pos = jnp.arange(per_term)[None, :]
        gather_idx = starts[:, None] + pos
        valid = (pos < sizes[:, None]) & (counts[:, None] > 0)
        docs = jnp.where(valid, post_docs[gather_idx], sentinel).ravel()
        w = jnp.where(valid,
                      post_w[gather_idx] * counts[:, None].astype(jnp.float32),
                      0.0).ravel()
        own_term = jnp.arange(m, dtype=jnp.int32) // per_term

        def score_chunk(c0):
            cd = jax.lax.dynamic_slice(docs, (c0,), (chunk,))
            eq = cd[:, None] == docs[None, :]                      # [C, M]
            s = jnp.dot(eq.astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)        # [C]
            pres = jnp.dot(eq.astype(jnp.bfloat16), ind,
                           preferred_element_type=jnp.float32)     # [C, T]
            first_term = jnp.argmax(pres > 0.5, axis=1).astype(jnp.int32)
            own = jax.lax.dynamic_slice(own_term, (c0,), (chunk,))
            keep = (first_term == own) & (cd < sentinel)
            return jnp.where(keep, s, NEG_INF)

        starts_c = jnp.arange(0, m, chunk)
        scores = jax.lax.map(score_chunk, starts_c).reshape(m)
        s, i = jax.lax.top_k(scores, k)
        return s, docs[i]

    return jax.vmap(one_query)(term_ids, term_counts)


def bm25_sparse_scores_auto(term_ids, term_counts, offsets, post_docs,
                            post_w, n_docs_pad: int, chunk: int = 512,
                            max_postings: int = 16384):
    """Pallas kernel where it lowers; XLA scatter path on TPU (see module
    docstring)."""
    if jax.default_backend() == "tpu":
        return bm25_sparse_scores_xla(term_ids, term_counts, offsets,
                                      post_docs, post_w, n_docs_pad,
                                      max_postings)
    return bm25_sparse_scores(term_ids, term_counts, offsets, post_docs,
                              post_w, n_docs_pad, chunk=chunk,
                              interpret=jax.default_backend() == "cpu")


# ---------------------------------------------------------------------------
# host-side builder: CSR postings with precomputed contributions

def build_postings(doc_term_ids, doc_term_freqs, vocab_size: int,
                   k1: float = 1.5, b: float = 0.75, epsilon: float = 0.25,
                   chunk: int = 512
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(offsets [V+1], post_docs [NNZ_pad], post_w [NNZ_pad]) — term-major
    CSR with per-(term,doc) contribution weights (ops.bm25 math). Postings
    pad to a chunk multiple at the tail; padded entries carry weight 0 and
    doc id 0."""
    from legalrag_tpu.ops.bm25 import compute_idf

    n_docs = len(doc_term_ids)
    df = np.zeros(vocab_size, np.int64)
    doc_len = np.zeros(n_docs, np.float64)
    for d, (ids, tfs) in enumerate(zip(doc_term_ids, doc_term_freqs)):
        df[ids] += 1
        doc_len[d] = tfs.sum()
    avgdl = doc_len.mean() if n_docs else 1.0
    idf = compute_idf(df, n_docs, epsilon)
    norm = k1 * (1.0 - b + b * doc_len / max(avgdl, 1e-9))

    per_term_docs = [[] for _ in range(vocab_size)]
    per_term_w = [[] for _ in range(vocab_size)]
    for d, (ids, tfs) in enumerate(zip(doc_term_ids, doc_term_freqs)):
        contrib = idf[ids] * tfs * (k1 + 1.0) / (tfs + norm[d])
        for t, w in zip(ids, contrib):
            per_term_docs[t].append(d)
            per_term_w[t].append(w)

    offsets = np.zeros(vocab_size + 1, np.int32)
    docs_flat, w_flat = [], []
    for t in range(vocab_size):
        offsets[t] = len(docs_flat)
        docs_flat.extend(per_term_docs[t])
        w_flat.extend(per_term_w[t])
    offsets[vocab_size] = len(docs_flat)
    nnz_pad = _round_up(len(docs_flat) + chunk, chunk)
    post_docs = np.zeros(nnz_pad, np.int32)
    post_w = np.zeros(nnz_pad, np.float32)
    post_docs[: len(docs_flat)] = docs_flat
    post_w[: len(w_flat)] = w_flat
    return offsets, post_docs, post_w
