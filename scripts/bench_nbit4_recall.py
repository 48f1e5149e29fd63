"""nbit4 recall on REALISTIC token distributions (VERDICT r2 #5).

The round-2 "zero recall loss" figures used cluster-structured synthetic
vectors and self-retrieval — the easiest possible setting for a
quantizer. This bench rebuilds the evidence the honest way:

- corpus: the REAL zh statute corpus's per-token hash embeddings
  (1,260 articles of actual legal text), tiled to ``--n-docs`` with
  controlled perturbations (rotation noise at ``--sigma``) so the token
  distribution keeps its real structure; copy 0 of every article is kept
  EXACT and serves as the gold document.
- queries: extractive retrieval queries from the real articles
  (``generate_synthetic_data.extractive_queries``), token-encoded with
  the same encoder — real query→document retrieval, not self-retrieval.
- measurement: late-channel Recall@10 / MRR@10 through the bf16 store vs
  the int8 store vs the nbit4 (PLAID-class residual) store with the SAME
  queries. The quantization recall cost is the delta between columns.

Matches the setting of the reference's PLAID ``nbits=4`` claim
(``/root/reference/legalrag/retrieval/builders/colbert_builder.py:119-134``).

Usage: python -m scripts.bench_nbit4_recall [--n-docs 65536] [--queries 256]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lang", default="zh")
    ap.add_argument("--n-docs", type=int, default=65536)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--doc-maxlen", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=0.12,
                    help="perturbation scale for tiled copies (unit-norm "
                    "tokens; 0.12 keeps copies distinct but same-cluster)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--stores", default="bfloat16,int8,nbit4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from legalrag_tpu.config import AppConfig
    from legalrag_tpu.index.bundle import IndexBundle
    from legalrag_tpu.ops.maxsim import maxsim_topk
    from legalrag_tpu.utils.compile_cache import enable_compilation_cache
    from legalrag_tpu.utils.device import apply_force_cpu
    from scripts.generate_synthetic_data import extractive_queries

    apply_force_cpu()
    enable_compilation_cache()
    cfg = AppConfig.load().with_lang(args.lang)
    cfg.engine.late_doc_maxlen = args.doc_maxlen
    bundle = IndexBundle.load(cfg.paths.lang_index_dir, cfg, args.lang,
                              device=jax.devices("cpu")[0])
    enc = bundle.encoder
    chunks = bundle.chunks
    n_real = len(chunks)
    log(f"real corpus: {n_real} articles")

    # real per-token embeddings for every article (host, hash encoder)
    t0 = time.time()
    real_tok, real_mask = enc.encode_tokens([c.text for c in chunks],
                                            args.doc_maxlen)
    dt_tok = real_tok.shape[-1]
    log(f"encoded real tokens {real_tok.shape} in {time.time() - t0:.1f}s")

    # tile to n_docs: copy 0 of each article is EXACT (gold), further
    # copies perturb within the token's neighborhood
    rng = np.random.default_rng(args.seed)
    n = args.n_docs
    reps = -(-n // n_real)
    tok = np.empty((n, args.doc_maxlen, dt_tok), np.float32)
    mask = np.empty((n, args.doc_maxlen), bool)
    src = np.tile(np.arange(n_real), reps)[:n]
    copy_no = np.repeat(np.arange(reps), n_real)[:n]
    t0 = time.time()
    step = 4096
    for s in range(0, n, step):
        e = min(s + step, n)
        base = real_tok[src[s:e]]
        noise = rng.standard_normal(base.shape).astype(np.float32)
        sig = np.where(copy_no[s:e, None, None] == 0, 0.0, args.sigma)
        out = base + sig * noise
        out /= np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-9)
        tok[s:e] = out
        mask[s:e] = real_mask[src[s:e]]
    gold_row = {a: i for i, a in enumerate(src[:n_real])}  # copy-0 rows
    log(f"tiled store {tok.shape} in {time.time() - t0:.1f}s "
        f"({tok.nbytes / 1e9:.2f} GB f32 host)")

    # real extractive retrieval queries from the articles
    rows = extractive_queries(chunks, n=args.queries, seed=args.seed,
                              per_article=1, hardness=0.0)
    rows = rows[: args.queries]
    aid2row = {c.article_id: i for i, c in enumerate(chunks)}
    q_tok, q_mask = enc.encode_tokens([r["query"] for r in rows],
                                      args.doc_maxlen)
    gold = np.asarray([gold_row[aid2row[r["article_id"]]] for r in rows])
    log(f"queries: {len(rows)}")

    results = {}
    for store_kind in args.stores.split(","):
        if store_kind == "nbit4":
            from legalrag_tpu.index.token_index import Residual4TokenIndex

            idx = Residual4TokenIndex(dt_tok, args.doc_maxlen,
                                      capacity_round=n,
                                      device=jax.devices("cpu")[0])
        else:
            from legalrag_tpu.index.token_index import TokenIndex

            idx = TokenIndex(dt_tok, args.doc_maxlen, capacity_round=n,
                             dtype=store_kind, device=jax.devices("cpu")[0])
        t0 = time.time()
        for s in range(0, n, 8192):
            idx.add(tok[s:s + 8192], mask[s:s + 8192])
        log(f"[{store_kind}] built in {time.time() - t0:.1f}s "
            f"({idx.nbytes / 1e9:.2f} GB)")

        hits10, rr = 0, 0.0
        for s in range(0, len(rows), args.batch):
            qb = q_tok[s:s + args.batch]
            qm = q_mask[s:s + args.batch]
            _, ids = idx.topk(qb, qm, 10)
            for g, row_ids in zip(gold[s:s + args.batch], ids.tolist()):
                if g in row_ids:
                    hits10 += 1
                    rr += 1.0 / (row_ids.index(g) + 1)
        r10 = hits10 / len(rows)
        mrr = rr / len(rows)
        results[store_kind] = {"recall@10": round(r10, 4),
                               "mrr@10": round(mrr, 4),
                               "store_gb": round(idx.nbytes / 1e9, 3)}
        log(f"[{store_kind}] late-channel R@10 {r10:.4f} MRR@10 {mrr:.4f}")
        del idx

    base = results.get("bfloat16") or next(iter(results.values()))
    out = {"metric": "nbit4_realistic_recall", "n_docs": n,
           "queries": len(rows), "sigma": args.sigma, "stores": results}
    for k, v in results.items():
        v["recall_delta_vs_bf16"] = round(v["recall@10"]
                                          - base["recall@10"], 4)
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
