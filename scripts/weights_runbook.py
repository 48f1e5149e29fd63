"""One-command validation the moment real pretrained weights exist.

This image is zero-egress, so every model loader in the repo is
torch-parity-tested on RANDOM inits only (tests/test_checkpoint_parity.py)
— real-weight QUALITY (the reference's headline table, reference
``notebooks/03_Retrieval_Performance_Evaluation.ipynb`` cell 40; encoder
semantics at reference ``legalrag/retrieval/vector_store.py:131-155``) is
the one unproven claim. When a weights directory is mounted (or the HF
cache is populated), this runbook turns that claim into a report:

  1. checkpoint load            — every named model through the JAX loaders
  2. encoder cosine parity      — JAX vs torch on real texts (>0.999 gate,
                                  SURVEY.md §7.2.3)
  3. retrieval quality          — rebuild the index with the real encoder,
                                  run the full eval (Hit/R/MRR/nDCG) and
                                  compare to the reference's published table
  4. decode + spec acceptance   — tok/s plain vs prompt-lookup speculation
                                  (accepted drafts/round needs a model that
                                  actually quotes its prompt) and, when
                                  given, a real draft model

Usage (names resolve through a local path or the offline HF hub cache):
  python -m scripts.weights_runbook \
      --encoder-zh BAAI/bge-base-zh-v1.5 --encoder-en BAAI/bge-base-en-v1.5 \
      --cross-encoder BAAI/bge-reranker-v2-m3 \
      --decoder Qwen/Qwen2.5-0.5B-Instruct [--draft Qwen/Qwen2.5-0.5B] \
      [--out WEIGHTS_REPORT.md] [--limit 100] [--skip-eval]

Every phase is independently guarded: a missing model marks its phase
SKIPPED and the report still lands.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from legalrag_tpu.utils import get_logger  # noqa: E402

log = get_logger("weights_runbook")

PARITY_GATE = 0.999  # SURVEY.md §7.2.3

# reference's published zh table (notebook 03 cell 40; BASELINE.md) — the
# quality bar the real-weight eval is compared against
REFERENCE_ZH = {
    "fused": {"recall@10": 0.85, "mrr@10": 0.651},
    "hybrid": {"recall@10": 0.84, "mrr@10": 0.691},
}

SAMPLE_ZH = [
    "合同无效的情形有哪些？",
    "夫妻共同财产如何分割？",
    "侵权责任的构成要件是什么？",
    "第五百条规定了什么内容？",
]
SAMPLE_EN = [
    "What constitutes acceptance of goods under the UCC?",
    "When may a buyer revoke acceptance under Section 2-608?",
    "What are the requirements for a negotiable instrument?",
    "Remedies for breach of a sales contract.",
]

RAG_PROMPT = (
    "You are a legal assistant. Based on the candidate provisions below, "
    "answer the question and cite article numbers.\n"
    "[Candidate Provision 1] Article 500: A party who, in the course of "
    "concluding a contract, acts in bad faith shall be liable for damages."
    "\nQuestion: What liability arises from bad-faith contract negotiation?"
    "\nAnswer:")


def _resolve(name: Optional[str]) -> Optional[Path]:
    if not name:
        return None
    from legalrag_tpu.models.bert import resolve_model_dir

    try:
        return resolve_model_dir(name)
    except FileNotFoundError:
        return None


# ------------------------------------------------------------ phase 2
def encoder_parity(name: str, lang: str, report: Dict) -> bool:
    """JAX encoder vs torch reference on real texts: cosine > 0.999 for
    both query (instructed) and passage views."""
    from legalrag_tpu.models.bert import FlaxBertEncoder

    texts = SAMPLE_ZH if lang == "zh" else SAMPLE_EN
    instruction = ("为这个句子生成表示以用于检索相关文章：" if lang == "zh"
                   else "Represent this sentence for searching relevant "
                        "passages: ")
    enc = FlaxBertEncoder.from_pretrained(name, instruction=instruction)
    ours_q = enc.encode_queries(texts)
    ours_p = enc.encode_passages(texts)

    import torch
    from transformers import AutoModel, AutoTokenizer

    mdir = str(_resolve(name))
    tok = AutoTokenizer.from_pretrained(mdir)
    model = AutoModel.from_pretrained(mdir)
    model.eval()

    def torch_encode(ts: List[str]) -> np.ndarray:
        with torch.no_grad():
            b = tok(ts, padding=True, truncation=True, max_length=512,
                    return_tensors="pt")
            out = model(**b).last_hidden_state[:, 0]  # BGE: CLS pool
            out = torch.nn.functional.normalize(out, dim=-1)
        return out.numpy()

    ref_q = torch_encode([instruction + t for t in texts])
    ref_p = torch_encode(texts)
    cos_q = float(np.min(np.sum(ours_q * ref_q, axis=-1)))
    cos_p = float(np.min(np.sum(ours_p * ref_p, axis=-1)))
    ok = cos_q > PARITY_GATE and cos_p > PARITY_GATE
    report[f"encoder_parity_{lang}"] = {
        "model": name, "min_cos_query": round(cos_q, 6),
        "min_cos_passage": round(cos_p, 6), "gate": PARITY_GATE, "pass": ok}
    log.info("[%s] encoder parity: query %.6f passage %.6f -> %s",
             lang, cos_q, cos_p, "PASS" if ok else "FAIL")
    return ok


def cross_encoder_parity(name: str, report: Dict) -> bool:
    from legalrag_tpu.models.bert import FlaxBertCrossEncoder

    pairs = [(SAMPLE_ZH[0], "合同无效的五种情形……"),
             (SAMPLE_EN[0], "Acceptance of goods occurs when the buyer...")]
    ce = FlaxBertCrossEncoder.from_pretrained(name)
    ours = np.asarray(ce.score_pairs(pairs), np.float64)

    import torch
    from transformers import (AutoModelForSequenceClassification,
                              AutoTokenizer)

    mdir = str(_resolve(name))
    tok = AutoTokenizer.from_pretrained(mdir)
    model = AutoModelForSequenceClassification.from_pretrained(mdir)
    model.eval()
    with torch.no_grad():
        b = tok([p[0] for p in pairs], [p[1] for p in pairs], padding=True,
                truncation=True, max_length=512, return_tensors="pt")
        ref = model(**b).logits.squeeze(-1).numpy().astype(np.float64)
    err = float(np.max(np.abs(ours - ref)))
    ok = err < 1e-3
    report["cross_encoder_parity"] = {
        "model": name, "max_abs_err": round(err, 6), "pass": ok}
    log.info("cross-encoder parity: max |err| %.6f -> %s", err,
             "PASS" if ok else "FAIL")
    return ok


# ------------------------------------------------------------ phase 3
def retrieval_eval(cfg, limit: int, report: Dict) -> None:
    """Rebuild per-lang bundles with the REAL encoder (fresh version dir,
    never touching the active hash-backend index) and run the eval."""
    import jax

    from legalrag_tpu.corpus import load_chunks_from_dir
    from legalrag_tpu.evals import aggregate, evaluate_one
    from legalrag_tpu.graph import LawGraphStore
    from legalrag_tpu.index import IndexBundle, IndexRegistry
    from legalrag_tpu.retrieval.engine import FusedQueryEngine
    from legalrag_tpu.retrieval.hybrid import HybridRetriever
    from legalrag_tpu.utils import detect_lang
    from scripts.evaluate_retrieval import load_eval_set, run_system

    eval_path = Path(cfg.paths.eval_dir) / "law_qa.jsonl"
    if not eval_path.exists():
        report["retrieval_eval"] = {"skipped": f"no eval set {eval_path}"}
        return
    rows = load_eval_set(eval_path)
    if limit:
        rows = rows[:limit]
    by_lang: Dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.get("lang") or detect_lang(r["query"]),
                           []).append(r)

    cpu = jax.devices("cpu")[0]
    out: Dict[str, Dict] = {}
    for lang, lang_rows in sorted(by_lang.items()):
        lang_cfg = cfg.with_lang(lang)
        chunks = [c for c in load_chunks_from_dir(cfg.paths.processed_dir)
                  if (c.lang or "zh") == lang]
        if not chunks:
            continue
        t0 = time.time()
        bundle = IndexBundle.build_from_chunks(chunks, lang_cfg, lang,
                                               device=cpu)
        root = Path(cfg.paths.index_dir) / lang
        vdir = IndexRegistry(root).versions_root() / cfg.index_version
        bundle.save(vdir)
        build_s = time.time() - t0
        bundle = IndexBundle.load(vdir, lang_cfg, lang)
        graph = LawGraphStore(lang_cfg.paths.graph_file)
        hybrid = HybridRetriever(bundle, lang_cfg, graph_store=graph)
        engine = FusedQueryEngine(bundle, lang_cfg)
        metrics: Dict[str, list] = {"fused": [], "hybrid": []}
        for row in lang_rows:
            for system in ("fused", "hybrid"):
                try:
                    ranked = run_system(system, row["query"], hybrid,
                                        engine, 20)
                    metrics[system].append(
                        evaluate_one(ranked, str(row["article_id"])))
                except Exception as e:
                    log.warning("[%s] %s failed: %s", lang, system, e)
        summary = {s: {k: round(v["mean"], 4) for k, v in
                       aggregate(m).items()}
                   for s, m in metrics.items() if m}
        out[lang] = {"n_queries": len(lang_rows),
                     "index_build_s": round(build_s, 1), **summary}
        if lang == "zh" and "fused" in summary:
            out[lang]["reference_table"] = REFERENCE_ZH
        log.info("[%s] eval done: %s", lang, json.dumps(summary))
    report["retrieval_eval"] = out


# ------------------------------------------------------------ phase 4
def decode_bench(decoder: str, draft: Optional[str], report: Dict) -> None:
    from legalrag_tpu.models.decoder import JaxDecoderLM
    from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM

    lm = JaxDecoderLM.from_pretrained(decoder, max_len=1024)
    tok = lm.tokenizer
    ids = tok(RAG_PROMPT)["input_ids"]

    def run(engine, label: str) -> Dict:
        t0 = time.time()
        toks = list(engine.generate_stream(ids, max_new_tokens=128,
                                           eos_id=tok.eos_token_id))
        dt = time.time() - t0
        d = {"tokens": len(toks), "tok_per_s": round(len(toks) / dt, 2),
             "text_head": tok.decode(toks)[:120]}
        stats = getattr(engine, "last_stats", None)
        if stats:
            d["spec_stats"] = {k: round(float(v), 3)
                               for k, v in stats.items()}
        log.info("%s: %s", label, json.dumps(d, ensure_ascii=False))
        return d

    res = {"plain": run(lm, "plain decode")}
    # warm second pass for steady-state tok/s (first pays compile)
    res["plain_warm"] = run(lm, "plain decode (warm)")
    spec = SpecLookupDecoderLM(lm.params, lm.cfg, tokenizer=tok,
                               max_len=1024, spec_k=8, spec_steps=2)
    res["spec_prompt_lookup"] = run(spec, "prompt-lookup spec")
    if draft and _resolve(draft):
        lmd = JaxDecoderLM.from_pretrained(
            decoder, max_len=1024, draft_model=draft)
        del lmd  # loader check only; full draft bench via bench_decode
        res["draft_model"] = {"loaded": True, "note":
                              "run scripts.bench_decode --draft for tok/s"}
    report["decode"] = {"model": decoder, **res}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder-zh", default="BAAI/bge-base-zh-v1.5")
    ap.add_argument("--encoder-en", default="BAAI/bge-base-en-v1.5")
    ap.add_argument("--cross-encoder", default="BAAI/bge-reranker-v2-m3")
    ap.add_argument("--decoder", default=None)
    ap.add_argument("--draft", default=None)
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--out", default=str(REPO / "WEIGHTS_REPORT.md"))
    args = ap.parse_args()

    from legalrag_tpu.config import AppConfig

    report: Dict = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

    # phase 1+2: encoders
    eval_ready = {}
    for lang, name in (("zh", args.encoder_zh), ("en", args.encoder_en)):
        if _resolve(name) is None:
            report[f"encoder_parity_{lang}"] = {"skipped":
                                                f"{name} not found"}
            log.warning("[%s] %s not found locally — phase skipped",
                        lang, name)
            continue
        try:
            eval_ready[lang] = encoder_parity(name, lang, report)
        except Exception as e:
            report[f"encoder_parity_{lang}"] = {"error": str(e)[:300]}
            log.exception("[%s] encoder parity crashed", lang)
    if args.cross_encoder and _resolve(args.cross_encoder) is not None:
        try:
            cross_encoder_parity(args.cross_encoder, report)
        except Exception as e:
            report["cross_encoder_parity"] = {"error": str(e)[:300]}
    else:
        report["cross_encoder_parity"] = {"skipped": "model not found"}

    # phase 3: retrieval quality with the real encoder
    if eval_ready and not args.skip_eval:
        cfg = AppConfig.load()
        cfg.retrieval.embedding_backend = "bert"
        cfg.retrieval.embedding_model_zh = args.encoder_zh
        cfg.retrieval.embedding_model_en = args.encoder_en
        cfg.index_version = "weights-" + time.strftime("%Y%m%d%H%M")
        try:
            retrieval_eval(cfg, args.limit, report)
        except Exception as e:
            report["retrieval_eval"] = {"error": str(e)[:300]}
            log.exception("retrieval eval crashed")
    else:
        report.setdefault("retrieval_eval",
                          {"skipped": "no parity-passing encoder"})

    # phase 4: decode + speculation acceptance
    if args.decoder and _resolve(args.decoder) is not None:
        try:
            decode_bench(args.decoder, args.draft, report)
        except Exception as e:
            report["decode"] = {"error": str(e)[:300]}
            log.exception("decode bench crashed")
    else:
        report["decode"] = {"skipped": "no --decoder given or not found"}

    lines = ["# Weights validation report", "",
             f"Generated {report['ts']} by `scripts/weights_runbook.py`.",
             "", "```json", json.dumps(report, indent=1,
                                       ensure_ascii=False), "```", ""]
    Path(args.out).write_text("\n".join(lines), encoding="utf-8")
    print(json.dumps({"report": args.out,
                      "phases": {k: ("pass" if isinstance(v, dict)
                                     and v.get("pass") else
                                     "skipped" if isinstance(v, dict)
                                     and "skipped" in v else "ran")
                                 for k, v in report.items()
                                 if k != "ts"}}))


if __name__ == "__main__":
    main()
