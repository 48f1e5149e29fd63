"""Scale benchmark: the large-corpus fused engine on a synthetic corpus.

Synthesizes an N-doc index directly as device arrays (unit-norm dense rows,
int8 token store, Zipf-ish CSR postings) and measures the large-mode fused
program (dense full matmul + sparse-scatter BM25 + candidate MaxSim + fusion
+ top-k) end-to-end on the accelerator. This is the production-scale
configuration the statute corpus never exercises.

Usage: python -m scripts.bench_scale [--n-docs 65536] [--batch 64]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=65536)
    ap.add_argument("--vocab", type=int, default=65536)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--doc-len", type=int, default=64)
    ap.add_argument("--token-dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--candidates", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dense-dtype", choices=("bfloat16", "int8"),
                    default="bfloat16",
                    help="dense embedding store: int8 = unit-int8 "
                    "(ops.topk.dense_scores) — halves the dense HBM "
                    "stream, s8xs8->s32 scoring")
    ap.add_argument("--token-dtype", choices=("int8", "nbit4", "bfloat16"),
                    default="int8",
                    help="token-store storage (nbit4 = PLAID-class "
                    "residual compression)")
    ap.add_argument("--dense-map", choices=("float32", "bfloat16"),
                    default="float32",
                    help="dtype of the [B, N] dense score map (bfloat16 "
                    "halves the dominant HBM stream; winners rescored "
                    "exactly in f32 — ops/fused_query.py)")
    ap.add_argument("--recall-queries", type=int, default=0,
                    help="also measure late-channel self-retrieval "
                    "Recall@10 with this many noisy queries (quantifies "
                    "the compression recall cost at scale)")
    ap.add_argument("--breakdown", action="store_true",
                    help="also time each stage of the hybrid program as "
                    "its own jitted sub-program (dense 2-pass vs full "
                    "top_k, BM25, candidate MaxSim, list fusion) — names "
                    "where the ms/batch goes (VERDICT r2 #1)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from legalrag_tpu.ops.fused_query import FusedParams, fused_hybrid_topk
    from legalrag_tpu.utils.compile_cache import enable_compilation_cache
    from legalrag_tpu.utils.device import apply_force_cpu

    apply_force_cpu()
    enable_compilation_cache()
    n, v, d = args.n_docs, args.vocab, args.dim
    rng = np.random.default_rng(0)
    print(f"synthesizing {n} docs (d={d}, tokens {args.doc_len}x"
          f"{args.token_dim} {args.token_dtype}, vocab {v}) on "
          f"{jax.default_backend()}", file=sys.stderr, flush=True)

    # generate float32 directly and mutate in place: page faulting on this
    # image is ~20 MB/s, so every avoidable multi-GB temporary (f64
    # standard_normal, out-of-place arithmetic) costs minutes of wall
    emb = rng.standard_normal((n, d), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    if args.dense_dtype == "int8":
        emb *= 127.0
        np.rint(emb, out=emb)
        emb = jnp.asarray(emb.astype(np.int8))
    else:
        emb = jnp.asarray(emb).astype(jnp.bfloat16)

    # cluster-structured unit token vectors (quantization behaves like real
    # embeddings; iid noise would understate compression error)
    centers = rng.standard_normal((1024, args.token_dim),
                                  dtype=np.float32)
    assign = rng.integers(0, 1024, n * args.doc_len)
    tok_f = rng.standard_normal((n * args.doc_len, args.token_dim),
                                dtype=np.float32)
    tok_f *= 0.35
    tok_f += centers[assign]
    tok_f /= np.linalg.norm(tok_f, axis=1, keepdims=True)
    tok_f = tok_f.reshape(n, args.doc_len, args.token_dim)
    mask_np = np.ones((n, args.doc_len), bool)
    store_bytes = 0
    if args.token_dtype == "nbit4":
        from legalrag_tpu.index.token_index import Residual4TokenIndex

        t0 = time.perf_counter()
        # build on CPU (eager store construction on a remote accelerator
        # pays one compile per op), then ship the packed store once
        idx = Residual4TokenIndex(args.token_dim, args.doc_len,
                                  capacity_round=n,
                                  device=jax.devices("cpu")[0])
        idx.add(tok_f, mask_np)
        store = idx.tok
        doc_tok = type(store)(*(jax.device_put(np.asarray(x)) for x in store))
        print(f"nbit4 encode: {time.perf_counter() - t0:.1f}s "
              f"({idx.nbytes / 1e9:.2f} GB)", file=sys.stderr, flush=True)
        store_bytes = idx.nbytes
    elif args.token_dtype == "int8":
        q = tok_f * 127  # one f32 temporary; round/clip in place
        np.round(q, out=q)
        np.clip(q, -127, 127, out=q)
        doc_tok = jnp.asarray(q.astype(np.int8))
        del q
        store_bytes = doc_tok.nbytes
    else:
        doc_tok = jnp.asarray(tok_f, jnp.bfloat16)
        store_bytes = doc_tok.nbytes
    doc_mask = jnp.asarray(mask_np)

    # Zipf-ish postings: term t appears in ~n/(t+10) docs, capped
    sizes = np.minimum((n // (np.arange(v) + 10)).astype(np.int64), 2048)
    offsets = np.zeros(v + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    nnz = int(offsets[-1])
    post_docs = rng.integers(0, n, nnz).astype(np.int32)
    post_w = np.abs(rng.standard_normal(nnz)).astype(np.float32)
    print(f"postings nnz={nnz/1e6:.1f}M "
          f"(~{(post_docs.nbytes + post_w.nbytes) / 1e9:.2f} GB)",
          file=sys.stderr, flush=True)
    sparse = (jnp.asarray(offsets.astype(np.int32)), jnp.asarray(post_docs),
              jnp.asarray(post_w))

    b = args.batch
    qvec = rng.standard_normal((b, d)).astype(np.float32)
    qvec /= np.linalg.norm(qvec, axis=1, keepdims=True)
    qvec = jnp.asarray(qvec)
    term_ids = jnp.asarray(rng.integers(0, v, (b, 32)).astype(np.int32))
    term_counts = jnp.asarray(np.ones((b, 32), np.int32))
    q_tok = rng.standard_normal((b, 16, args.token_dim)).astype(np.float32)
    q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
    q_tok = jnp.asarray(q_tok)
    q_mask = jnp.ones((b, 16), bool)

    params = FusedParams(eff_k=64, final_k=10, rrf_k=60.0, alpha=0.5,
                         w_dense=0.6, w_bm25=0.4, w_late=0.35,
                         late_candidates=args.candidates,
                         max_postings=32 * 2048,
                         dense_map_bf16=(args.dense_map == "bfloat16"))
    run = lambda: fused_hybrid_topk(emb, sparse, doc_tok, doc_mask, qvec,
                                    (term_ids, term_counts), q_tok, q_mask,
                                    jnp.int32(n), params)
    t0 = time.perf_counter()
    out = run()
    np.asarray(out["rows"])
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    # two-pass slope timing: block_until_ready does not drain the queue on
    # remote relay backends, so each pass ends with a host FETCH and the
    # constant sync overhead cancels in the slope
    def one_pass(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = run()
        np.asarray(out["rows"])
        return time.perf_counter() - t0

    one_pass(3)
    t1 = one_pass(args.iters)
    t2 = one_pass(2 * args.iters)
    dt = max((t2 - t1) / args.iters, 1e-9)
    print(f"{n} docs: {dt * 1e3:.2f} ms/batch{b} -> {b / dt:.0f} q/s "
          f"(device-side hybrid, tokens={args.token_dtype})",
          file=sys.stderr, flush=True)

    if args.breakdown:
        import functools

        from legalrag_tpu.ops.bm25_sparse import (
            bm25_sparse_topk_merge,
            bm25_sparse_topk_sorted,
        )
        from legalrag_tpu.ops.fused_query import fuse_candidate_lists
        from legalrag_tpu.ops.maxsim import maxsim_candidates
        from legalrag_tpu.ops.topk import NEG_INF, dense_scores, topk_2pass

        def masked_scores(e, qv):
            s = dense_scores(e, qv)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            return jnp.where(col < n, s, NEG_INF)

        eff_k, c = params.eff_k, min(args.candidates, n)
        stages = {
            "dense_dot_only": jax.jit(
                lambda e, qv: jnp.sum(masked_scores(e, qv), axis=1)),
            "dense_topk_full": jax.jit(
                lambda e, qv: jax.lax.top_k(masked_scores(e, qv), eff_k)),
            "dense_topk_2pass": jax.jit(
                lambda e, qv: topk_2pass(masked_scores(e, qv), eff_k)),
            "bm25_sorted_segment": jax.jit(functools.partial(
                bm25_sparse_topk_sorted, k=eff_k,
                max_postings=params.max_postings)),
            "bm25_merge_network": jax.jit(functools.partial(
                bm25_sparse_topk_merge, k=eff_k,
                max_postings=params.max_postings)),
            "maxsim_candidates": jax.jit(maxsim_candidates),
        }
        cand_rows = jnp.asarray(
            rng.integers(0, n, (b, c)).astype(np.int32))
        lists_static = [
            (params.w_dense,
             jnp.sort(rng.standard_normal((b, eff_k)).astype(np.float32)
                      )[:, ::-1],
             jnp.asarray(rng.integers(0, n, (b, eff_k)).astype(np.int32))),
            (params.w_bm25,
             jnp.sort(rng.standard_normal((b, eff_k)).astype(np.float32)
                      )[:, ::-1],
             jnp.asarray(rng.integers(0, n, (b, eff_k)).astype(np.int32))),
            (params.w_late,
             jnp.sort(rng.standard_normal((b, eff_k)).astype(np.float32)
                      )[:, ::-1],
             jnp.asarray(rng.integers(0, n, (b, eff_k)).astype(np.int32))),
        ]

        def fuse_only(*flat):
            def row(*r):
                per = [(lists_static[j][0], r[2 * j], r[2 * j + 1])
                       for j in range(3)]
                out = fuse_candidate_lists(per, params.rrf_k, params.alpha,
                                           params.final_k)
                return out["top_s"], out["rows"]
            return jax.vmap(row)(*flat)

        flat_lists = []
        for _, s, i in lists_static:
            flat_lists += [s, i]
        stages["list_fusion"] = jax.jit(fuse_only)

        calls = {
            "dense_dot_only": lambda f: f(emb, qvec),
            "dense_topk_full": lambda f: f(emb, qvec),
            "dense_topk_2pass": lambda f: f(emb, qvec),
            "bm25_sorted_segment": lambda f: f(
                term_ids, term_counts, *sparse),
            "bm25_merge_network": lambda f: f(
                term_ids, term_counts, *sparse),
            "maxsim_candidates": lambda f: f(doc_tok, doc_mask, q_tok,
                                             q_mask, cand_rows),
            "list_fusion": lambda f: f(*flat_lists),
        }
        for name, fn in stages.items():
            call = calls[name]
            try:
                t0 = time.perf_counter()
                np.asarray(jax.tree_util.tree_leaves(call(fn))[0])
                compile_s = time.perf_counter() - t0

                def one(m, _call=call, _fn=fn):
                    t = time.perf_counter()
                    out = None
                    for _ in range(m):
                        out = _call(_fn)
                    np.asarray(jax.tree_util.tree_leaves(out)[0])
                    return time.perf_counter() - t

                one(3)
                ta = one(args.iters)
                tb = one(2 * args.iters)
                ms = max((tb - ta) / args.iters, 1e-9) * 1e3
                print(f"stage {name:22s} {ms:8.2f} ms/batch{b} "
                      f"(compile+first {compile_s:.1f}s)",
                      file=sys.stderr, flush=True)
                print(f'{{"metric": "scale_stage_ms", "stage": "{name}", '
                      f'"n_docs": {n}, "value": {ms:.2f}, '
                      f'"unit": "ms/batch{b}"}}')
            except Exception as e:
                print(f"stage {name}: FAILED {str(e)[:200]}",
                      file=sys.stderr, flush=True)

    recall = None
    if args.recall_queries:
        # late-channel self-retrieval: queries are noisy copies of gold-doc
        # tokens; Recall@10 quantifies the compression recall cost
        from legalrag_tpu.ops.maxsim import maxsim_topk

        g = args.recall_queries
        gold = rng.choice(n, g, replace=False)
        qs = tok_f[gold, :16] + 0.15 * rng.standard_normal(
            (g, 16, args.token_dim)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
        hits = 0
        for s in range(0, g, b):
            qb = jnp.asarray(qs[s:s + b])
            qm = jnp.ones(qb.shape[:2], bool)
            _, rows = maxsim_topk(doc_tok, doc_mask, qb, qm, n, 16)
            rows = np.asarray(rows)[:, :10]
            hits += sum(int(gd in r) for gd, r in
                        zip(gold[s:s + b].tolist(), rows.tolist()))
        recall = hits / g
        print(f"late-channel self-retrieval Recall@10 "
              f"({args.token_dtype}): {recall:.4f}", file=sys.stderr,
              flush=True)

    extra = (f', "late_recall@10": {recall:.4f}' if recall is not None
             else "")
    print(f'{{"metric": "scale_hybrid_qps", "n_docs": {n}, '
          f'"value": {b / dt:.1f}, "unit": "queries/s", '
          f'"dense_dtype": "{args.dense_dtype}", '
          f'"dense_map": "{args.dense_map}", '
          f'"token_dtype": "{args.token_dtype}", '
          f'"token_store_gb": {store_bytes / 1e9:.3f}{extra}}}')


if __name__ == "__main__":
    main()
