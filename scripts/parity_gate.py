"""Algorithm-level parity gate (VERDICT r1 #7): the device engine vs a
pure-NumPy oracle on the REAL corpora, same encoder.

The oracle recomputes every ranking stage with reference math on the host:
exact dense inner products (NumPy BLAS), verbatim-BM25Okapi scoring
(``ops.bm25.bm25_scores_oracle`` — idf epsilon-floor and all), exact MaxSim
(einsum over the stored token embeddings), then the reference host fusion
(``retrieval.fusion.fuse``) with identical eff_k/weights/rrf params. The
engine answer is the single fused device program. Gate: Recall@10 and MRR@10
computed against extractive gold must agree within ε, and mean top-10
overlap must be high — one command that fails on any ranking-math
regression. Reference metrics protocol: BASELINE.md.

Usage: python -m scripts.parity_gate [--lang zh] [--n 200] [--eps 0.01]
Exits nonzero on failure; prints one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import List

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from legalrag_tpu.utils.device import apply_force_cpu  # noqa: E402


def make_queries(bundle, n: int, seed: int = 0):
    import re

    rng = np.random.default_rng(seed)
    rows = rng.permutation(bundle.n_docs)
    queries, gold = [], []
    for row in rows:
        text = bundle.chunks[int(row)].text
        sents = [s for s in re.split(r"[。；！? .;!?\n]", text)
                 if 8 <= len(s) <= 80]
        if not sents:
            continue
        queries.append(sents[rng.integers(len(sents))])
        gold.append(int(row))
        if len(queries) >= n:
            break
    return queries, gold


class NumpyOracle:
    """Reference-math hybrid retrieval, entirely on the host."""

    def __init__(self, bundle, cfg, eff_k: int):
        from legalrag_tpu.tokenize import tokenize

        self.cfg = cfg
        self.eff_k = eff_k
        self.enc = bundle.encoder
        self.emb = np.asarray(bundle.dense.emb[: bundle.dense.n], np.float32)
        self.doc_tokens = [tokenize(c.text, bundle.lang)
                           for c in bundle.chunks]
        self.lang = bundle.lang
        # uniform across bf16/int8/nbit4 stores: host f32 reconstruction
        # matching what the device MaxSim producers score
        self.tok, self.mask = bundle.tokens.dequantized_rows(
            0, bundle.tokens.n)
        self.maxq = cfg.engine.max_query_tokens
        r = cfg.retrieval
        self.k1, self.b, self.eps = r.bm25_k1, r.bm25_b, r.bm25_epsilon

    def search(self, question: str, top_k: int) -> List[int]:
        from legalrag_tpu.ops.bm25 import bm25_scores_oracle
        from legalrag_tpu.retrieval.fusion import ChannelResult, fuse
        from legalrag_tpu.tokenize import tokenize

        r = self.cfg.retrieval
        eff = min(self.eff_k, len(self.doc_tokens))
        qv = self.enc.encode_queries([question])[0]
        dense_s = self.emb @ qv
        bm25_s = bm25_scores_oracle(self.doc_tokens,
                                    tokenize(question, self.lang),
                                    k1=self.k1, b=self.b, epsilon=self.eps)
        qt, qm = self.enc.encode_tokens([question], self.maxq)
        sim = np.einsum("qd,nld->nql", qt[0].astype(np.float32), self.tok)
        sim = np.where(self.mask[:, None, :], sim, -np.inf)
        best = sim.max(axis=-1)
        best = np.where(np.isfinite(best), best, 0.0)
        best = np.where(qm[0][None, :], best, 0.0)
        late_s = best.sum(axis=-1)

        def top(scores):
            i = np.argpartition(-scores, min(eff, len(scores) - 1))[:eff]
            return i[np.argsort(-scores[i], kind="stable")]

        d_i, b_i, l_i = top(dense_s), top(bm25_s), top(late_s)
        fused = fuse([
            ChannelResult("dense", r.dense_weight, d_i, dense_s[d_i]),
            ChannelResult("bm25", r.bm25_weight, b_i, bm25_s[b_i]),
            ChannelResult("colbert", r.colbert_weight, l_i, late_s[l_i]),
        ], method=r.fusion_method, rrf_k=r.rrf_k, alpha=r.rrf_alpha)
        return [c.row for c in fused[:top_k]]


def recall_mrr(results: List[List[int]], gold: List[int], k: int):
    hits = [g in r[:k] for r, g in zip(results, gold)]
    rr = []
    for r, g in zip(results, gold):
        rr.append(1.0 / (r[:k].index(g) + 1) if g in r[:k] else 0.0)
    return float(np.mean(hits)), float(np.mean(rr))


def run_gate(lang: str = "zh", n: int = 200, eps: float = 0.01,
             top_k: int = 10, bundle=None, cfg=None) -> dict:
    from legalrag_tpu.retrieval.engine import FusedQueryEngine

    if bundle is None:
        from legalrag_tpu.config import AppConfig

        cfg = AppConfig.load()
        sys.path.insert(0, str(REPO / "scripts"))
        from bench import ensure_index  # reuse the corpus/index bootstrap

        bundle = ensure_index(cfg, lang)
    lang_cfg = cfg.with_lang(lang)
    queries, gold = make_queries(bundle, n)

    engine = FusedQueryEngine(bundle, lang_cfg)
    eff_k = engine._params(top_k).eff_k
    engine_rows = [r[:top_k].tolist()
                   for r in engine.search_batch(queries, top_k)[1]]
    oracle = NumpyOracle(bundle, lang_cfg, eff_k)
    oracle_rows = [oracle.search(q, top_k) for q in queries]

    r_e, m_e = recall_mrr(engine_rows, gold, top_k)
    r_o, m_o = recall_mrr(oracle_rows, gold, top_k)
    overlap = float(np.mean([
        len(set(a) & set(b)) / max(len(set(b)), 1)
        for a, b in zip(engine_rows, oracle_rows)]))
    ok = (abs(r_e - r_o) <= eps and abs(m_e - m_o) <= eps * 2
          and overlap >= 0.9)
    return {"ok": ok, "lang": lang, "n": len(queries),
            "engine": {"recall@10": round(r_e, 4), "mrr@10": round(m_e, 4)},
            "oracle": {"recall@10": round(r_o, 4), "mrr@10": round(m_o, 4)},
            "top10_overlap": round(overlap, 4), "eps": eps}


def main() -> None:
    apply_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--lang", default="zh")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--eps", type=float, default=0.01)
    args = ap.parse_args()
    out = run_gate(args.lang, args.n, args.eps)
    print(json.dumps(out, ensure_ascii=False))
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
