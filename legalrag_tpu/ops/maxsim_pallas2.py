"""Mosaic-safe MaxSim kernel (formulation 2: no multi-dim VMEM reshapes).

``maxsim_pallas`` (formulation 1) is numerically validated but its in-VMEM
4-D reshape crashes this image's Mosaic compile helper. This variant uses
only operations known to lower on TC kernels:

- grid walks doc tiles; the doc block arrives token-position-major
  ([L, tile_t, dt], transposed once on the host side of the call), so each
  token position j is a contiguous 2-D [tile_t, dt] slab;
- per position j: one MXU matmul ``q2 [B·Lq, dt] × slab.T`` → [B·Lq, tile_t],
  masked and folded into a running elementwise max (VPU);
- the query-token sum reduces with a constant 0/1 selector matmul
  ``G [B, B·Lq]`` (built from broadcasted_iota) — no sublane reshape.

score(q, d) = Σ_{i ∈ q tokens} max_{j ∈ d tokens} (q_i · d_j).

Hardware status: compiles and runs on the image's v5e (unlike formulation
1); accuracy vs an exact f32 oracle is 0.2% max relative — the same
MXU-bf16 truncation class as the XLA path (0.1%). The per-token-position
matmul fold is latency-bound at small tiles; the fused XLA MaxSim remains
the serving default, this kernel is the building block for regimes where
the [B, tile, Lq, L] XLA intermediate cannot fuse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q2_ref, qsel_ref, d_ref, dmask_ref, out_ref, *, l_doc: int):
    """q2 [B·Lq, dt]; qsel [B, B·Lq] 0/1 (query-ownership × query mask);
    d [L, T, dt]; dmask [L, T]; out [B, T]."""
    bq = q2_ref.shape[0]
    t = d_ref.shape[1]
    q2 = q2_ref[...]

    def body(j, best):
        slab = d_ref[j]          # [T, dt]
        sim = jax.lax.dot_general(
            q2, slab, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [B·Lq, T]
        sim = jnp.where(dmask_ref[j][None, :], sim, -1e30)
        return jnp.maximum(best, sim)

    best = jax.lax.fori_loop(0, l_doc, body,
                             jnp.full((bq, t), -1e30, jnp.float32))
    best = jnp.where(best <= -1e29, 0.0, best)  # empty docs contribute 0
    out_ref[...] = jnp.dot(qsel_ref[...], best,
                           preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_t", "interpret"))
def maxsim_scores_pallas2(doc_tok: jax.Array, doc_mask: jax.Array,
                          q_tok: jax.Array, q_mask: jax.Array,
                          tile_t: int = 128, interpret: bool = False
                          ) -> jax.Array:
    """doc_tok [N, L, dt], q_tok [B, Lq, dt] → [B, N] f32 (N % tile_t == 0)."""
    n, l, dt = doc_tok.shape
    b, lq, _ = q_tok.shape
    num_tiles = n // tile_t
    # host-side layout prep (XLA transposes, outside the kernel)
    d_lmaj = jnp.transpose(doc_tok, (1, 0, 2)).astype(jnp.float32)  # [L, N, dt]
    m_lmaj = jnp.transpose(doc_mask, (1, 0))                        # [L, N]
    q2 = q_tok.reshape(b * lq, dt).astype(jnp.float32)
    owner = jax.lax.broadcasted_iota(jnp.int32, (b, b * lq), 1) // lq
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b * lq), 0)
    qsel = ((owner == rows)
            & q_mask.reshape(1, b * lq).astype(bool)).astype(jnp.float32)

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b * lq, dt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b * lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, tile_t, dt), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, tile_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, l_doc=l),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lq * n * l * dt,
            bytes_accessed=n * l * dt * 4 + b * lq * dt * 4,
            transcendentals=0),
        interpret=interpret,
    )(q2, qsel, d_lmaj, m_lmaj)
