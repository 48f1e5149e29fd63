"""Pallas MaxSim kernel: late-interaction scoring without HBM intermediates.

The XLA path (``ops.maxsim``) materializes a [B, tile, Lq, L] similarity
block per tile in HBM when fusion misses; this kernel keeps the whole
per-tile computation in VMEM: one MXU matmul (query tokens × doc-tile
tokens) and VPU max/sum reductions, emitting only the [B, tile] scores.
Grid walks doc tiles; doc-token tiles stream HBM→VMEM via the standard
pipelined BlockSpec machinery (double-buffered by Mosaic).

score(q, d) = Σ_{i ∈ q tokens} max_{j ∈ d tokens} (q_i · d_j), with padded
doc tokens masked to -inf before the max and padded query tokens zeroed.

Backend status: validated in interpret mode against the XLA path; this
image's Mosaic remote-compile helper crashes on the kernel's in-VMEM 4-D
reshape (verified on hardware, HTTP 500 from tpu_compile_helper), so
production TPU serving uses the fused XLA MaxSim inside
``ops.fused_query`` — which XLA fuses without HBM intermediates at these
shapes anyway (measured 6.3 ms for a full batch-64 hybrid query).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _maxsim_kernel(q_ref, qmask_ref, d_ref, dmask_ref, out_ref):
    """One doc tile: q [B, Lq, dt], doc tile [T, L, dt] → out [B, T]."""
    b, lq, dt = q_ref.shape
    t, l, _ = d_ref.shape
    q = q_ref[...].reshape(b * lq, dt)
    d = d_ref[...].reshape(t * l, dt)
    sim = jax.lax.dot_general(
        q, d, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(b, lq, t, l)
    dmask = dmask_ref[...]  # [T, L] bool
    sim = jnp.where(dmask[None, None, :, :], sim, -1e30)
    best = jnp.max(sim, axis=3)                      # [B, Lq, T]
    # fully-masked (empty) docs give -1e30 → contribute 0
    best = jnp.where(best <= -1e29, 0.0, best)
    qmask = qmask_ref[...]  # [B, Lq] bool
    best = jnp.where(qmask[:, :, None], best, 0.0)
    out_ref[...] = jnp.sum(best, axis=1)             # [B, T]


@functools.partial(jax.jit, static_argnames=("tile_t", "interpret"))
def maxsim_scores_pallas(doc_tok: jax.Array, doc_mask: jax.Array,
                         q_tok: jax.Array, q_mask: jax.Array,
                         tile_t: int = 128, interpret: bool = False
                         ) -> jax.Array:
    """doc_tok [N, L, dt], q_tok [B, Lq, dt] → [B, N] f32 (N % tile_t == 0).

    Mosaic tiling: the output block's lane dimension is ``tile_t`` — keep it
    a multiple of 128 on real TPUs (smaller tiles are fine in interpret
    mode, which the tests use for tiny shapes)."""
    n, l, dt = doc_tok.shape
    b, lq, _ = q_tok.shape
    assert n % tile_t == 0, f"N={n} must be a multiple of tile_t={tile_t}"
    num_tiles = n // tile_t
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, lq, dt), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, lq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, l, dt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _maxsim_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lq * n * l * dt,
            bytes_accessed=n * l * dt * doc_tok.dtype.itemsize
            + b * lq * dt * 4, transcendentals=0),
        interpret=interpret,
    )(q_tok, q_mask, doc_tok, doc_mask)
