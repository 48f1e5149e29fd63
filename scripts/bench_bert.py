"""Bert-backend serving benchmark (VERDICT r1 #4 done-criterion).

Measures the PRODUCTION-PARITY configuration: a BGE-base-shaped (12-layer,
H=768) BERT encoder running as a jitted JAX program on the chip, feeding the
same one-shot fused hybrid program the hash backend uses. Weights are
random-init (no checkpoints in this image) — throughput is identical to real
BGE weights since shapes/dtypes define the cost; retrieval *quality* under
this config is the plug-and-measure step once weights exist
(tests/test_checkpoint_parity.py validates the loading math).

Usage:  python -m scripts.bench_bert [--n-queries 512] [--batch 64]
Prints one JSON line on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def make_bge_shaped_checkpoint(d: Path, lang: str = "zh") -> None:
    """Random-init HF checkpoint with bge-base-{zh,en}-v1.5 geometry
    (BertModel: 12 layers, H=768, A=12, I=3072, vocab per language family)."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    vocab_size = 21128 if lang == "zh" else 30522
    torch.manual_seed(0)
    model = BertModel(BertConfig(
        vocab_size=vocab_size, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512))
    model.save_pretrained(d)
    # a small real wordpiece vocab is enough for tokenizer throughput parity
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(200)]
    (d / "vocab.txt").write_text("\n".join(words), encoding="utf-8")
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(d)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-queries", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--max-length", type=int, default=64,
                    help="query token budget (BGE queries are short; "
                    "passages use 512 at build time)")
    ap.add_argument("--sharded", type=int, default=0,
                    help="also measure the SHARDED serving path on an "
                    "n-device mesh (1 = the single real chip): separate "
                    "encode + sharded-channels executions vs the round-3 "
                    "encoder-fused one-execution program (VERDICT r2 #4)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from legalrag_tpu.utils.compile_cache import enable_compilation_cache
    from legalrag_tpu.utils.device import apply_force_cpu

    apply_force_cpu()
    enable_compilation_cache()

    from legalrag_tpu.config import AppConfig
    from legalrag_tpu.models.bert import FlaxBertEncoder
    from legalrag_tpu.ops.fused_query import FusedParams, fused_hybrid_topk
    from legalrag_tpu.ops.topk import bucket_k

    cfg = AppConfig.load()
    r = cfg.retrieval

    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td)
        log("building bge-base-shaped random-init checkpoint...")
        make_bge_shaped_checkpoint(ckpt, "zh")
        enc = FlaxBertEncoder.from_pretrained(
            str(ckpt), instruction=r.query_instruction_zh,
            max_length=args.max_length, token_dim=cfg.engine.late_dim)

    # index arrays with the production shapes (content irrelevant for
    # throughput; the zh Civil Code scale = 1,260 docs, capacity-rounded)
    n_docs, cap = 1260, 2048
    d, l_doc, dt_tok = 768, cfg.engine.late_doc_maxlen, cfg.engine.late_dim
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((cap, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    v_pad = 4096
    impact = np.abs(rng.standard_normal((v_pad, cap))).astype(np.float32)
    doc_tok = rng.standard_normal((cap, l_doc, dt_tok)).astype(np.float32)
    doc_mask = np.ones((cap, l_doc), bool)
    dtype = jnp.dtype(cfg.engine.dtype)
    emb_d = jnp.asarray(emb, dtype)
    impact_d = jnp.asarray(impact, dtype)
    doc_tok_d = jnp.asarray(doc_tok, dtype)
    doc_mask_d = jnp.asarray(doc_mask)

    queries = [f"问题 tok{i % 180} tok{(i * 7) % 180} 的法律责任如何认定"
               for i in range(args.n_queries)]
    batches = [queries[i:i + args.batch]
               for i in range(0, len(queries), args.batch)]
    params = FusedParams(
        eff_k=bucket_k(args.top_k * r.oversample_factor, cap),
        final_k=bucket_k(args.top_k, cap), rrf_k=float(r.rrf_k),
        alpha=float(r.rrf_alpha), w_dense=float(r.dense_weight),
        w_bm25=float(r.bm25_weight), w_late=float(r.colbert_weight))

    def run_batch(batch):
        # ONE encoder execution for both query views, then the fused program
        qv, qt, qm = enc.encode_query_bundle(batch,
                                             cfg.engine.max_query_tokens)
        qv = jnp.asarray(qv)
        term_ids = np.zeros((len(batch), 8), np.int32)       # host tokenize
        term_mask = np.ones((len(batch), 8), np.float32)
        return fused_hybrid_topk(
            emb_d, impact_d, doc_tok_d, doc_mask_d, qv,
            (jnp.asarray(term_ids), jnp.asarray(term_mask)),
            jnp.asarray(qt, dtype), jnp.asarray(qm),
            jnp.int32(n_docs), params)

    # fully-fused: encoder forward(s) INSIDE the search program (the
    # production serving path, engine._bert_e2e_program analogue)
    import functools

    from legalrag_tpu.models.bert import bert_query_views

    @functools.partial(jax.jit, static_argnames=("fp",))
    def e2e(p, proj, ids_q, mask_q, ids_t, mask_t, term_ids, term_mask, fp):
        qv, qt = bert_query_views(p, enc.cfg, proj, enc.token_dim,
                                  ids_q, mask_q, ids_t, mask_t)
        return fused_hybrid_topk(emb_d, impact_d, doc_tok_d, doc_mask_d, qv,
                                 (term_ids, term_mask), qt.astype(dtype),
                                 mask_t.astype(bool), jnp.int32(n_docs), fp)

    def run_batch_e2e(batch):
        q_texts = [enc.instruction + t for t in batch]
        ids_q, mask_q = enc._tokenize(q_texts, enc.max_length)
        ids_t, mask_t = enc._tokenize(batch, cfg.engine.max_query_tokens)
        term_ids = jnp.zeros((len(batch), 8), jnp.int32)
        term_mask = jnp.ones((len(batch), 8), jnp.float32)
        return e2e(enc.params, enc.token_proj, ids_q, mask_q, ids_t, mask_t,
                   term_ids, term_mask, params)

    t0 = time.perf_counter()
    out = run_batch(batches[0])
    np.asarray(out["rows"])
    out = run_batch_e2e(batches[0])
    np.asarray(out["rows"])
    log(f"compile+warmup: {time.perf_counter() - t0:.1f}s "
        f"on {jax.default_backend()}")

    def one_pass(runner):
        t0 = time.perf_counter()
        in_flight = [runner(b) for b in batches]
        np.asarray(jnp.stack([o["rows"] for o in in_flight]))
        return time.perf_counter() - t0

    dt = min(one_pass(run_batch) for _ in range(3))
    qps = len(queries) / dt
    log(f"bert backend (2-exec): {len(queries)} queries in {dt:.2f}s "
        f"(best of 3) -> {qps:.1f} q/s")
    dt_e2e = min(one_pass(run_batch_e2e) for _ in range(3))
    qps = len(queries) / dt_e2e
    log(f"bert backend (fused e2e, 1-exec): {len(queries)} queries in "
        f"{dt_e2e:.2f}s (best of 3) -> {qps:.1f} q/s")
    dt = min(dt, dt_e2e)
    qps = len(queries) / dt

    # encode-only split for the diagnosis (the bundled two-view forward —
    # the program the serving path actually runs)
    t0 = time.perf_counter()
    for b in batches:
        enc.encode_query_bundle(b, cfg.engine.max_query_tokens)
    enc_dt = time.perf_counter() - t0
    log(f"encode-only (bundled fwd): {len(queries) / enc_dt:.1f} q/s")

    out = {
        "metric": "bert_backend_qps_per_chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "encode_only_qps": round(len(queries) / enc_dt, 2),
        "batch": args.batch,
    }

    if args.sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from legalrag_tpu.parallel.mesh import MODEL_AXIS, make_mesh
        from legalrag_tpu.parallel.sharded_search import (
            make_sharded_bert_channels_step,
            sharded_channels_topk,
        )

        devs = jax.devices()[: args.sharded]
        mesh = make_mesh(devs, data=1, model=len(devs))
        emb_sh = jax.device_put(emb_d, NamedSharding(mesh,
                                                     P(MODEL_AXIS, None)))
        imp_sh = jax.device_put(impact_d,
                                NamedSharding(mesh, P(None, MODEL_AXIS)))
        tok_sh = jax.device_put(doc_tok_d,
                                NamedSharding(mesh,
                                              P(MODEL_AXIS, None, None)))
        mask_sh = jax.device_put(doc_mask_d,
                                 NamedSharding(mesh, P(MODEL_AXIS, None)))
        eff_k = params.eff_k
        valid_n = jnp.int32(n_docs)

        def run_sharded_2exec(batch):
            qv, qt, qm = enc.encode_query_bundle(
                batch, cfg.engine.max_query_tokens)
            term_ids = jnp.zeros((len(batch), 8), jnp.int32)
            term_mask = jnp.ones((len(batch), 8), jnp.float32)
            return sharded_channels_topk(
                mesh, eff_k, emb_sh, imp_sh, tok_sh, mask_sh,
                jnp.asarray(qv), (term_ids, term_mask),
                jnp.asarray(qt, dtype), jnp.asarray(qm), valid_n)

        fused_step = make_sharded_bert_channels_step(
            mesh, eff_k, True, enc.cfg, enc.token_dim, dtype)

        def run_sharded_1exec(batch):
            q_texts = [enc.instruction + t for t in batch]
            ids_q, mask_q = enc._tokenize(q_texts, enc.max_length)
            ids_t, mask_t = enc._tokenize(batch,
                                          cfg.engine.max_query_tokens)
            term_ids = jnp.zeros((len(batch), 8), jnp.int32)
            term_mask = jnp.ones((len(batch), 8), jnp.float32)
            res = fused_step(enc.params, enc.token_proj, ids_q, mask_q,
                             ids_t, mask_t, emb_sh, imp_sh, tok_sh,
                             mask_sh, term_ids, term_mask, valid_n)
            return {"dense": res[0], "bm25": res[1], "colbert": res[2]}

        def one_pass_sh(runner):
            t0 = time.perf_counter()
            in_flight = [runner(b) for b in batches]
            np.asarray(jnp.stack([o["dense"][0] for o in in_flight]))
            return time.perf_counter() - t0

        for runner in (run_sharded_2exec, run_sharded_1exec):
            o = runner(batches[0])
            np.asarray(o["dense"][0])  # compile
        dt2 = min(one_pass_sh(run_sharded_2exec) for _ in range(3))
        dt1 = min(one_pass_sh(run_sharded_1exec) for _ in range(3))
        out["sharded"] = {
            "mesh_model": len(devs),
            "two_exec_qps": round(len(queries) / dt2, 2),
            "fused_one_exec_qps": round(len(queries) / dt1, 2),
            "gain": round(dt2 / dt1, 2),
        }
        log(f"sharded ({len(devs)}-device mesh): 2-exec "
            f"{len(queries) / dt2:.1f} q/s vs fused 1-exec "
            f"{len(queries) / dt1:.1f} q/s ({dt2 / dt1:.2f}x)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
