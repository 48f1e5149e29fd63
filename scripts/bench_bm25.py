"""Sparse-BM25 formulation bench: sorted-segment vs equality-contraction.

The million-doc breakdown (EVAL.md) measured the sorted-segment stage at
~2x the rest of the fused hybrid program combined — and its bitonic-sort
cost is N-independent at fixed ``max_postings``, which is why 262k and 1M
hybrid throughput converge. This bench synthesizes ONLY the CSR postings
(seconds, not the 35-minute full-corpus synthesis) and slope-times the two
top-k formulations at production geometry, so routing is measured.

Usage: python -m scripts.bench_bm25 [--n-docs 1048576] [--batch 64]
Output: one JSON line per (backend, n_docs) on stdout.
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
    import jax

    def drain(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    def one_pass(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn()
        drain(out)
        return time.perf_counter() - t0

    one_pass(3)
    slopes = []
    for _ in range(3):
        t1 = one_pass(iters)
        t2 = one_pass(2 * iters)
        s = (t2 - t1) / iters
        log(f"  raw: t({iters})={t1:.3f}s t({2 * iters})={t2:.3f}s "
            f"slope={s * 1e3:.2f}ms")
        if s > 0:
            slopes.append(s)
    if not slopes:
        return one_pass(iters) / iters
    slopes.sort()
    return slopes[len(slopes) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1048576)
    ap.add_argument("--vocab", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max-terms", type=int, default=64)
    ap.add_argument("--avg-postings", type=int, default=93,
                    help="mean posting-list length (1M bench_scale nnz/V)")
    ap.add_argument("--max-postings", type=int, default=16384)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunks", default="512,1024,2048",
                    help="eq-contraction candidate chunk sizes to sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from legalrag_tpu.ops.bm25_sparse import (
        bm25_sparse_topk_eq,
        bm25_sparse_topk_merge,
        bm25_sparse_topk_sorted,
    )
    from legalrag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    v, n = args.vocab, args.n_docs

    # synthetic CSR: zipf-ish posting lengths around the measured mean,
    # sorted doc ids per term (the builder's invariant)
    sizes = np.minimum(
        rng.poisson(args.avg_postings, v), 4 * args.avg_postings
    ).astype(np.int64)
    nnz = int(sizes.sum())
    offsets = np.zeros(v + 1, np.int32)
    offsets[1:] = np.cumsum(sizes)
    post_docs = rng.integers(0, n, nnz).astype(np.int32)
    # per-term sort (host, vectorized via lexsort on (term, doc))
    term_of = np.repeat(np.arange(v), sizes)
    order = np.lexsort((post_docs, term_of))
    post_docs = post_docs[order]
    post_w = rng.random(nnz).astype(np.float32) + 0.1
    log(f"CSR: nnz={nnz / 1e6:.1f}M")

    term_ids = rng.integers(0, v, (args.batch, args.max_terms)).astype(np.int32)
    term_counts = np.ones((args.batch, args.max_terms), np.int32)

    dev_args = (jnp.asarray(term_ids), jnp.asarray(term_counts),
                jnp.asarray(offsets), jnp.asarray(post_docs),
                jnp.asarray(post_w))
    results = []

    import functools

    cases = {"sorted": jax.jit(functools.partial(
        bm25_sparse_topk_sorted, k=args.k, max_postings=args.max_postings)),
        "merge": jax.jit(functools.partial(
            bm25_sparse_topk_merge, k=args.k,
            max_postings=args.max_postings))}
    for c in (int(x) for x in args.chunks.split(",")):
        cases[f"eq_c{c}"] = jax.jit(functools.partial(
            bm25_sparse_topk_eq, k=args.k, max_postings=args.max_postings,
            chunk=c))

    ref = None
    for name, fn in cases.items():
        try:
            t0 = time.perf_counter()
            out = fn(*dev_args)
            s = np.asarray(out[0])
            log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
            if ref is None:
                ref = s
            else:  # formulations must agree on totals (top-1 per query)
                np.testing.assert_allclose(s[:, 0], ref[:, 0], rtol=2e-4, atol=2e-4)
            dt = timeit(lambda f=fn: f(*dev_args), args.iters)
            row = {"op": "bm25_sparse_topk", "backend": name, "n_docs": n,
                   "ms_per_batch": round(dt * 1e3, 3), "batch": args.batch,
                   "max_postings": args.max_postings}
        except Exception as e:
            row = {"op": "bm25_sparse_topk", "backend": name, "n_docs": n,
                   "error": str(e)[:300]}
        results.append(row)
        log(row)

    for row in results:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
