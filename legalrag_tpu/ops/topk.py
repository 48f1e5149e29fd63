"""Dense scoring + top-k: the engine's hottest op.

Replaces the reference's FAISS HNSW search (``faiss_builder.py:79-91``,
``vector_store.py:169``) with exact inner-product search on device: the
embedding matrix lives in HBM and a query batch is one fused program.
Exact search strictly dominates HNSW recall (SURVEY.md §2.9).

Two backends:

- ``xla``: ``q @ E.T`` + ``lax.top_k``. XLA fuses masking into the matmul
  epilogue; at small corpus scale the [B, N] score materialization is cheap.
- ``pallas``: a fused kernel that never materializes [B, N] in HBM — the
  grid walks corpus tiles, each step does the MXU matmul for its tile in
  VMEM and selects the tile-local top-k by iterative max+mask (VPU), writing
  only [tiles, B, K] candidates; a final tiny ``lax.top_k`` merges tiles.
  This is the path that scales to multi-million-row shards where HBM
  bandwidth on the score matrix dominates.

Both return identical results (tested against each other and a NumPy oracle).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python scalar: safe to close over inside pallas kernels


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bucket_k(k: int, n: int) -> int:
    """Round k up to a small fixed set so varying top_k values reuse one
    compiled program (k is a static shape under jit; without bucketing every
    distinct eff_top_k costs a fresh XLA compile — observed ~2-6 s/query on
    live serving). Callers slice [:k] host-side."""
    for b in (8, 16, 32, 64, 128, 256, 512):
        if k <= b:
            return min(b, n) if n else b
    return min(k, n) if n else k


def default_backend(n: int = 0) -> str:
    """Routing decision (VERDICT r1 #9, r2 #1), measured on the v5e with
    queue-draining slope timing (``scripts.bench_kernels``):

    - round 2: XLA's fused dot+top_k beats our Pallas formulations at every
      production size (2.8-3.8×; the round-1 ``block_until_ready`` numbers
      measured dispatch only and are retracted, EVAL.md). The Pallas kernel
      stays in-tree as a measured baseline.
    - round 3: at large N the full-width ``lax.top_k`` dominates the
      program (54.9 ms at B=256/N=1M vs a ~2-3 ms roofline); the exact
      two-pass block-max selection (``topk_2pass``) removes it. Routed by
      size: ``xla2`` (dot + two-pass) past TWO_PASS_MIN_N, plain ``xla``
      below."""
    return "xla2" if n >= TWO_PASS_MIN_N else "xla"


# ---------------------------------------------------------------------------
# XLA path

def dense_scores(emb: jax.Array, q: jax.Array) -> jax.Array:
    """[B, d] queries × [N, d] embedding rows → [B, N] f32 scores.

    One scorer for every storage dtype. ``emb`` of dtype int8 is the
    "unit-int8" store (``DenseIndex(dtype='int8')``): rows are
    ``round(127·e)`` of L2-normalized embeddings, the implicit global
    scale is 1/127 — so the corpus-side HBM stream HALVES vs bf16 and
    the matmul runs s8×s8→s32 on the MXU. Queries quantize per row on
    the fly; one rescale by (query row scale / 127) restores inner
    products. Per-element error ≤ 1/254 absolute, i.e. a ~2e-3 score
    std on unit vectors (query elements are ~1/√d) — measured
    rank-neutral on the bundled corpora (EVAL.md). Replaces the f32
    storage of the reference's FAISS flat/HNSW store
    (``vector_store.py:112-118``)."""
    if emb.dtype == jnp.int8:
        qf = q.astype(jnp.float32)
        amax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        qs = jnp.maximum(amax, 1e-8) / 127.0
        qq = jnp.round(qf / qs).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qq, emb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (qs / 127.0)
    return jnp.dot(q.astype(emb.dtype), emb.T,
                   preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def dense_topk_xla(emb: jax.Array, q: jax.Array, valid_n: jax.Array, k: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k inner products. emb [N, d], q [B, d] → ([B, k], [B, k])."""
    scores = dense_scores(emb, q)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < valid_n, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


# ---------------------------------------------------------------------------
# Two-pass (block-max) top-k for large N

# Below this many columns a single lax.top_k is already near the memory
# floor; above it the full-width selection dominates the program (measured
# round 2: 54.9 ms at B=256/N=1M vs a ~2-3 ms roofline, EVAL.md).
TWO_PASS_MIN_N = 131_072
TWO_PASS_BLOCK = 512


def topk_2pass(scores: jax.Array, k: int, block: int = TWO_PASS_BLOCK,
               block2: int = 128) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a [B, N] score map without a full-width sort.

    Pass 1 reduces each ``block``-wide column group to its max (a streaming
    read of the score map — no sort) and selects the top-k *blocks* per row.
    Pass 2 gathers only those blocks' columns (k·block values per row) and
    runs the final small ``lax.top_k`` there.

    Exactness: let v_k be the k-th largest value in a row. Every block
    containing a top-k element has block-max ≥ v_k, and at most k blocks
    have block-max ≥ v_k (each such block contributes at least one element
    ≥ v_k, and only k elements are ≥ v_k up to ties). So the k blocks with
    the largest maxima contain every top-k element; with ties at v_k the
    gathered set still holds ≥ k elements ≥ v_k, i.e. a valid top-k set
    (tie ORDER may differ from lax.top_k's lowest-index rule).

    Replaces the full-corpus selection of the reference's FAISS search
    (``vector_store.py:169``) at large N; routed by ``dense_topk`` /
    ``topk_large``.
    """
    b, n = scores.shape
    if k >= n:
        # lax.top_k requires k <= n: sort everything and pad out to k
        # columns (-inf scores, last valid index — downstream dedup keeps
        # best per row id, so duplicates never surface)
        vals, idx = jax.lax.top_k(scores, n)
        if k > n:
            vals = jnp.pad(vals, ((0, 0), (0, k - n)),
                           constant_values=NEG_INF)
            idx = jnp.pad(idx, ((0, 0), (0, k - n)), mode="edge")
        return vals, idx
    n_pad = _round_up(n, block)
    if n_pad != n:
        scores = jnp.pad(scores, ((0, 0), (0, n_pad - n)),
                         constant_values=NEG_INF)
    g = n_pad // block
    blk = scores.reshape(b, g, block)
    kb = min(k, g)
    _, top_blocks = jax.lax.top_k(jnp.max(blk, axis=2), kb)     # [B, kb]
    cand = jnp.take_along_axis(blk, top_blocks[:, :, None], axis=1)
    cand = cand.reshape(b, kb * block)                          # [B, kb*block]
    if block2 and kb * block > 8192:
        # the gathered row is itself wide (k·block columns, e.g. 32k for
        # k=64/block=512) — recurse once with a small block so the final
        # full sort runs over ≤ k·block2 columns (measured: the tail
        # lax.top_k dominated the first two-pass at B=256/N=1M)
        top_s, pos = topk_2pass(cand, k, block=block2, block2=0)
    else:
        top_s, pos = jax.lax.top_k(cand, k)
    blk_of = jnp.take_along_axis(top_blocks, pos // block, axis=1)
    # clamp: NEG_INF slots may sit in the rounding pad beyond n; callers
    # filter them by score but must never see an out-of-range row id
    top_i = jnp.minimum(blk_of * block + pos % block, n - 1)
    return top_s, top_i


def topk_large(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Route a [B, N] top-k: two-pass past TWO_PASS_MIN_N columns, plain
    ``lax.top_k`` below (where it is already near the memory floor)."""
    if scores.shape[1] >= TWO_PASS_MIN_N and k < scores.shape[1]:
        return topk_2pass(scores, k)
    return jax.lax.top_k(scores, k)


def topk_2pass_masked(scores: jax.Array, valid_n, k: int,
                      block: int = TWO_PASS_BLOCK, block2: int = 128
                      ) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of ``scores[:, :valid_n]`` WITHOUT materializing a
    masked copy of the [B, N] map.

    The ``jnp.where(col < valid_n, s, NEG_INF)`` mask the engine used to
    apply before selection is a full elementwise pass over the score map
    — at B=256/N=1M that is an extra 1.07 GB read + 1.07 GB write of HBM
    per batch, ~35% of the program's whole traffic (EVAL.md roofline
    table). Masking is exact at BLOCK granularity instead: fully-invalid
    blocks drop from the block-max array ([B, N/block] — tiny), the one
    straddling block is re-maxed under its column mask, and the gathered
    candidate columns (k·block per row) are masked by their true column
    ids before the final small top-k. Same result, none of the full-map
    traffic."""
    b, n = scores.shape
    valid_n = jnp.asarray(valid_n, jnp.int32)
    neg = jnp.asarray(NEG_INF, scores.dtype)
    if k >= n or n < 2 * block:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        return topk_2pass(jnp.where(col < valid_n, scores, neg), k,
                          block=block, block2=block2)
    n_pad = _round_up(n, block)
    if n_pad != n:
        scores = jnp.pad(scores, ((0, 0), (0, n_pad - n)),
                         constant_values=NEG_INF)
    g = n_pad // block
    blk = scores.reshape(b, g, block)
    bmax = jnp.max(blk, axis=2)                                 # [B, g]
    bidx = jnp.arange(g, dtype=jnp.int32)
    bmax = jnp.where(bidx[None, :] * block < valid_n, bmax, neg)
    # the straddling block (first block whose tail is invalid): re-max
    # under the column mask and patch it in
    vb = valid_n // block
    bb = jax.lax.dynamic_slice_in_dim(blk, jnp.minimum(vb, g - 1), 1,
                                      axis=1)[:, 0]             # [B, block]
    bcol = jnp.minimum(vb, g - 1) * block + jnp.arange(block)
    mb = jnp.max(jnp.where(bcol[None, :] < valid_n, bb, neg), axis=1)
    bmax = jnp.where((bidx[None, :] == vb) & (vb < g), mb[:, None], bmax)
    kb = min(k, g)
    _, top_blocks = jax.lax.top_k(bmax, kb)                     # [B, kb]
    cand = jnp.take_along_axis(blk, top_blocks[:, :, None], axis=1)
    cand_col = (top_blocks[:, :, None] * block
                + jnp.arange(block, dtype=jnp.int32)[None, None, :])
    cand = cand.reshape(b, kb * block)
    cand_col = cand_col.reshape(b, kb * block)
    cand = jnp.where(cand_col < valid_n, cand, neg)
    if block2 and kb * block > 8192:
        top_s, pos = topk_2pass(cand, k, block=block2, block2=0)
    else:
        top_s, pos = jax.lax.top_k(cand, k)
    top_i = jnp.take_along_axis(cand_col, pos, axis=1)
    return top_s, jnp.minimum(top_i, n - 1)


@functools.partial(jax.jit, static_argnames=("k", "block", "map_bf16"))
def dense_topk_2pass(emb: jax.Array, q: jax.Array, valid_n: jax.Array,
                     k: int, block: int = TWO_PASS_BLOCK,
                     map_bf16: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k inner products via the masked two-pass selection (no
    full-map mask pass — see :func:`topk_2pass_masked`).

    ``map_bf16`` writes the [B, N] score map in bf16 (HALF the map's HBM
    write+read, the dominant traffic at large N) and selects on it, then
    RESCORES the k winners exactly in f32 from re-gathered embedding rows
    (B·k·d — trivial) and re-sorts within k. Returned scores are exact;
    the selected SET can differ from f32 selection only among candidates
    whose true scores collide within one bf16 ulp (~4e-3 relative) —
    measured rank-neutral for retrieval (tests/test_ops_topk.py). Not
    applied to int8 stores (their s32-exact map is already the cheap
    path)."""
    if map_bf16 and emb.dtype != jnp.int8:
        scores = jnp.dot(q.astype(jnp.bfloat16), emb.astype(jnp.bfloat16).T,
                         preferred_element_type=jnp.bfloat16)
        s_lp, idx = topk_2pass_masked(scores, valid_n, k, block=block)
        rows = jnp.take(emb, idx, axis=0).astype(jnp.float32)   # [B, k, d]
        # mirror dense_scores' operand rounding (q cast to storage dtype)
        qf = q.astype(emb.dtype).astype(jnp.float32)
        exact = jnp.einsum("bd,bkd->bk", qf, rows)
        exact = jnp.where(s_lp.astype(jnp.float32) > NEG_INF / 2, exact,
                          NEG_INF)
        order = jnp.argsort(-exact, axis=1)
        return (jnp.take_along_axis(exact, order, axis=1),
                jnp.take_along_axis(idx, order, axis=1))
    return topk_2pass_masked(dense_scores(emb, q), valid_n, k, block=block)


# ---------------------------------------------------------------------------
# Pallas fused kernel

def _score_select_kernel(valid_ref, q_ref, e_ref, out_s_ref, out_i_ref, *, kp: int):
    """One corpus tile: MXU matmul then iterative top-kp selection on the VPU.

    valid_ref: SMEM (1,1) — number of valid corpus rows
    q_ref:  VMEM [B, d]     (whole query block, replicated across grid)
    e_ref:  VMEM [T, d]     (this tile's embedding rows)
    out_*:  VMEM [1, B, kp] (this tile's candidates, global row ids)
    """
    t = pl.program_id(0)
    tile_n = e_ref.shape[0]
    start = t * tile_n
    scores = jax.lax.dot_general(
        q_ref[:], e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, T]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col + start < valid_ref[0], scores, NEG_INF)

    def select(j, s):
        m = jnp.max(s, axis=1)
        am = jnp.argmax(s, axis=1).astype(jnp.int32)
        out_s_ref[0, :, j] = m
        out_i_ref[0, :, j] = am + start
        return jnp.where(col == am[:, None], NEG_INF, s)

    for j in range(kp):  # kp is static; unrolled VPU reductions
        scores = select(j, scores)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def dense_topk_pallas(emb: jax.Array, q: jax.Array, valid_n: jax.Array, k: int,
                      tile_n: int = 512, interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Fused score+select. emb [N, d] (N % tile_n == 0), q [B, d]."""
    n, d = emb.shape
    b = q.shape[0]
    assert n % tile_n == 0, f"N={n} must be padded to tile_n={tile_n}"
    num_tiles = n // tile_n
    kp = min(k, tile_n)
    valid = jnp.reshape(valid_n.astype(jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, kp), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, kp), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    out_s, out_i = pl.pallas_call(
        functools.partial(_score_select_kernel, kp=kp),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, b, kp), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, b, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, transcendentals=0,
            bytes_accessed=n * d * emb.dtype.itemsize + b * d * 4,
        ),
        interpret=interpret,
    )(valid, q.astype(emb.dtype), emb)

    # merge tile-local candidates: [tiles, B, kp] -> [B, tiles*kp] -> top_k
    cand_s = jnp.transpose(out_s, (1, 0, 2)).reshape(b, num_tiles * kp)
    cand_i = jnp.transpose(out_i, (1, 0, 2)).reshape(b, num_tiles * kp)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s, top_i


# ---------------------------------------------------------------------------
# public entry

def dense_topk(emb: jax.Array, q: jax.Array, valid_n, k: int, *,
               backend: str = "auto", tile_n: int = 512,
               interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Top-k inner-product search over an embedding matrix.

    ``emb`` rows beyond ``valid_n`` are capacity padding and are masked out.
    ``k`` is clamped to the padded row count. Returns f32 scores and i32 row
    ids, both [B, k].
    """
    if backend == "auto":
        backend = default_backend(emb.shape[0])
    if backend == "pallas" and emb.dtype == jnp.int8:
        # the Pallas tile kernel scores in the storage dtype directly;
        # unit-int8 stores route to the XLA scorer (which owns the
        # quantized-dot semantics)
        backend = default_backend(emb.shape[0])
    valid_n = jnp.asarray(valid_n, dtype=jnp.int32)
    k = min(k, emb.shape[0])
    if backend == "pallas":
        n = emb.shape[0]
        tile_n = min(tile_n, n)
        if n % tile_n:
            pad = _round_up(n, tile_n) - n
            emb = jnp.pad(emb, ((0, pad), (0, 0)))
        return dense_topk_pallas(emb, q, valid_n, k, tile_n=tile_n,
                                 interpret=interpret)
    if backend == "xla2":
        return dense_topk_2pass(emb, q, valid_n, k)
    return dense_topk_xla(emb, q, valid_n, k)


def full_scores(emb: jax.Array, q: jax.Array, valid_n) -> jax.Array:
    """[B, N] f32 score map (used by the fused hybrid path at modest N)."""
    scores = dense_scores(emb, q)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    return jnp.where(col < jnp.asarray(valid_n, jnp.int32), scores, NEG_INF)
