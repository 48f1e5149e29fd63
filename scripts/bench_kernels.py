"""Pallas-vs-XLA kernel quantification (VERDICT r1 #9).

Measures, on the current accelerator, the two ops that carry first-party
Pallas kernels against their XLA formulations at production scales:

- dense top-k (``ops.topk``: fused score+topk Pallas kernel vs XLA
  matmul + lax.top_k)
- MaxSim (``ops.maxsim_pallas2`` formulation-2 kernel vs
  ``ops.maxsim.maxsim_full`` XLA tiling)

Output: one JSON line per (op, n_docs, backend) on stdout — the evidence
behind the production kernel-routing decision recorded in EVAL.md and the
``ops.topk.default_backend`` comment.

Usage: python -m scripts.bench_kernels [--sizes 65536,262144] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, iters):
    """Two-pass slope timing: ``jax.block_until_ready`` does NOT drain the
    queue on remote relay backends (it returns at dispatch), so each pass
    ends with a HOST FETCH of the first output leaf, and the constant
    sync/fetch overhead cancels in the slope (t_2N − t_N) / N."""
    import jax
    import numpy as np

    def drain(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)

    def one_pass(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn()
        drain(out)
        return time.perf_counter() - t0

    one_pass(3)  # warm (post-compile steady state)
    slopes = []
    for _ in range(3):
        t1 = one_pass(iters)
        t2 = one_pass(2 * iters)
        s = (t2 - t1) / iters
        if s > 0:
            slopes.append(s)
    if not slopes:  # host hiccup inflated every t1; fall back to raw mean
        return one_pass(iters) / iters
    slopes.sort()
    return slopes[len(slopes) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="65536,262144")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--doc-len", type=int, default=64)
    ap.add_argument("--token-dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-maxsim", action="store_true",
                    help="dense-only (the >=1M memory-capped regime: the "
                    "token store would not fit beside the dense matrix)")
    ap.add_argument("--variants", default="",
                    help="comma list of two-pass selection variants to "
                    "measure instead of the backend sweep: 'mask' (round-3 "
                    "baseline — full [B,N] where-mask then topk_2pass), "
                    "'masked' (block-granular masking, no full-map pass), "
                    "'bf16' (bf16 score map + exact f32 rescore). "
                    "VERDICT r3 #3.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from legalrag_tpu.utils.compile_cache import enable_compilation_cache
    from legalrag_tpu.utils.device import apply_force_cpu

    apply_force_cpu()
    enable_compilation_cache()
    from legalrag_tpu.ops.maxsim import maxsim_full
    from legalrag_tpu.ops.topk import dense_topk

    backend = jax.default_backend()
    log(f"backend: {backend}")
    rng = np.random.default_rng(0)
    results = []

    for n in [int(s) for s in args.sizes.split(",")]:
        emb = rng.standard_normal((n, args.dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        emb = jnp.asarray(emb, jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal(
            (args.batch, args.dim)).astype(np.float32))
        valid = jnp.int32(n - 7)

        if args.variants:
            import functools

            from legalrag_tpu.ops.topk import (dense_scores,
                                               dense_topk_2pass, topk_2pass)

            @functools.partial(jax.jit, static_argnames=("k",))
            def full_mask_2pass(emb, q, valid_n, k):
                # the round-3 baseline: mask the whole [B, N] map first
                s = dense_scores(emb, q)
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < valid_n, s, -1e30)
                return topk_2pass(s, k)

            variants = {
                "mask": lambda: full_mask_2pass(emb, q, valid, args.k),
                "masked": lambda: dense_topk_2pass(emb, q, valid, args.k),
                "bf16": lambda: dense_topk_2pass(emb, q, valid, args.k,
                                                 map_bf16=True),
            }
            for name in args.variants.split(","):
                fn = variants[name.strip()]
                try:
                    dt = timeit(fn, args.iters)
                    row = {"op": "dense_select", "n_docs": n,
                           "variant": name, "batch": args.batch,
                           "ms_per_batch": round(dt * 1e3, 3)}
                except Exception as e:
                    row = {"op": "dense_select", "n_docs": n,
                           "variant": name, "error": str(e)[:200]}
                results.append(row)
                log(row)
            continue

        for kb in ("xla", "xla2", "pallas"):
            try:
                dt = timeit(
                    lambda: dense_topk(emb, q, valid, args.k, backend=kb), args.iters)
                row = {"op": "dense_topk", "n_docs": n, "backend": kb,
                       "ms_per_batch": round(dt * 1e3, 3),
                       "batch": args.batch}
            except Exception as e:
                row = {"op": "dense_topk", "n_docs": n, "backend": kb,
                       "error": str(e)[:200]}
            results.append(row)
            log(row)

        if args.skip_maxsim:
            continue
        # MaxSim over an int8 token store (the production large-N config)
        tok = jnp.asarray(rng.integers(-127, 128, (n, args.doc_len,
                                                   args.token_dim),
                                       dtype=np.int64).astype(np.int8))
        mask = jnp.ones((n, args.doc_len), bool)
        q_tok = rng.standard_normal((args.batch, 16, args.token_dim)
                                    ).astype(np.float32)
        q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
        q_tok = jnp.asarray(q_tok)
        q_mask = jnp.ones((args.batch, 16), bool)

        try:
            dt = timeit(lambda: maxsim_full(tok, mask, q_tok, q_mask,
                                            tile_n=256), args.iters)
            row = {"op": "maxsim_full", "n_docs": n, "backend": "xla-int8",
                   "ms_per_batch": round(dt * 1e3, 3), "batch": args.batch}
        except Exception as e:
            row = {"op": "maxsim_full", "n_docs": n, "backend": "xla-int8",
                   "error": str(e)[:200]}
        results.append(row)
        log(row)

        # chunked int8→bf16 conversion: one whole-array astype materializes
        # an f32 intermediate (~8.6 GB at n=262k) and OOMs the chip
        conv = jax.jit(lambda x: (x.astype(jnp.float32) / 127.0
                                  ).astype(jnp.bfloat16))
        step = 32768
        tok_f = jnp.concatenate(
            [conv(tok[i:i + step]) for i in range(0, n, step)], axis=0)
        try:
            # same bf16 operand as the Pallas kernel (apples-to-apples HBM
            # traffic; the int8 row above has half the bytes)
            dt = timeit(lambda: maxsim_full(tok_f, mask, q_tok, q_mask,
                                            tile_n=256), args.iters)
            row = {"op": "maxsim_full", "n_docs": n, "backend": "xla-bf16",
                   "ms_per_batch": round(dt * 1e3, 3), "batch": args.batch}
        except Exception as e:
            row = {"op": "maxsim_full", "n_docs": n, "backend": "xla-bf16",
                   "error": str(e)[:200]}
        results.append(row)
        log(row)

        try:
            from legalrag_tpu.ops.maxsim_pallas2 import maxsim_scores_pallas2

            dt = timeit(lambda: maxsim_scores_pallas2(tok_f, mask, q_tok,
                                                      q_mask), args.iters)
            row = {"op": "maxsim_full", "n_docs": n, "backend": "pallas2",
                   "ms_per_batch": round(dt * 1e3, 3), "batch": args.batch}
        except Exception as e:
            row = {"op": "maxsim_full", "n_docs": n, "backend": "pallas2",
                   "error": str(e)[:200]}
        results.append(row)
        log(row)
        del tok, tok_f, emb

    for row in results:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
