"""CLI: retrieval-quality evaluation across systems.

Parity with reference ``scripts/evaluate_retrieval.py`` (fixed — the
reference ships without ``import math`` and produces zero results,
SURVEY.md §2.13.2): loads ``data/eval/law_qa.jsonl`` records
``{query, article_id[, lang]}``, runs each system, reports
Hit@{3,10} / R@{5,10} / MRR@10 / nDCG@10 mean±std, optional CSV/JSON export.

Systems (reference ``evaluate_retrieval.py:193-273``):
  bm25 | dense | colbert | fused (device fused program) |
  fused+graph | hybrid (full HybridRetriever.search with rerank)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, List

from legalrag_tpu.config import AppConfig
from legalrag_tpu.evals import aggregate, evaluate_one
from legalrag_tpu.graph import LawGraphStore
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.retrieval.engine import FusedQueryEngine
from legalrag_tpu.retrieval.hybrid import HybridRetriever
from legalrag_tpu.schemas import IssueType, RoutingDecision, RoutingMode, TaskType
from legalrag_tpu.utils import detect_lang, get_logger

log = get_logger("evaluate_retrieval")

SYSTEMS = ("bm25", "dense", "colbert", "fused", "fused+graph", "hybrid")


def load_eval_set(path: Path) -> List[dict]:
    rows = []
    with path.open("r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def run_system(system: str, question: str, hybrid: HybridRetriever,
               engine: FusedQueryEngine, k: int) -> List[str]:
    if system == "bm25":
        hits = hybrid.search_bm25(question, k)
    elif system == "dense":
        hits = hybrid.search_dense(question, k)
    elif system == "colbert":
        hits = hybrid.search_colbert(question, k)
    elif system == "fused":
        return [h.chunk.article_id for h in engine.search_hits([question], k)[0]]
    elif system == "fused+graph":
        decision = RoutingDecision(task_type=TaskType.JUDGE_STYLE,
                                   issue_type=IssueType.OTHER,
                                   mode=RoutingMode.GRAPH_AUGMENTED)
        rerank = hybrid.cfg.retrieval.enable_rerank
        hybrid.cfg.retrieval.enable_rerank = False
        try:
            hits = hybrid.search(question, top_k=k, decision=decision)
        finally:
            hybrid.cfg.retrieval.enable_rerank = rerank
    else:  # hybrid (full)
        decision = RoutingDecision(task_type=TaskType.JUDGE_STYLE,
                                   issue_type=IssueType.OTHER,
                                   mode=RoutingMode.GRAPH_AUGMENTED)
        hits = hybrid.search(question, top_k=k, decision=decision)
    return [h.chunk.article_id for h in hits]


def main() -> None:
    from legalrag_tpu.utils.device import apply_force_cpu

    apply_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-file", default=None)
    ap.add_argument("--systems", default=",".join(SYSTEMS))
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--out-csv", default=None)
    ap.add_argument("--config", default=None,
                    help="config overlay JSON/YAML (e.g. a tuned-fusion "
                    "overlay from scripts.tune_fusion --out)")
    args = ap.parse_args()

    cfg = AppConfig.load(args.config)
    eval_path = Path(args.eval_file or Path(cfg.paths.eval_dir) / "law_qa.jsonl")
    if not eval_path.exists():
        log.error("eval set not found: %s (run scripts.generate_synthetic_data)",
                  eval_path)
        sys.exit(1)
    rows = load_eval_set(eval_path)
    if args.limit:
        rows = rows[: args.limit]
    systems = [s for s in args.systems.split(",") if s]

    by_lang: Dict[str, list] = defaultdict(list)
    for r in rows:
        by_lang[r.get("lang") or detect_lang(r["query"])].append(r)

    results: Dict[str, List[dict]] = defaultdict(list)
    results_lang: Dict[tuple, List[dict]] = defaultdict(list)
    for lang, lang_rows in sorted(by_lang.items()):
        lang_cfg = cfg.with_lang(lang)
        bundle = IndexBundle.load(lang_cfg.paths.lang_index_dir, lang_cfg, lang)
        graph = LawGraphStore(lang_cfg.paths.graph_file)
        hybrid = HybridRetriever(bundle, lang_cfg, graph_store=graph)
        engine = FusedQueryEngine(bundle, lang_cfg)
        log.info("[%s] evaluating %d queries over %d docs", lang,
                 len(lang_rows), bundle.n_docs)
        for i, row in enumerate(lang_rows):
            gold = str(row["article_id"])
            for system in systems:
                try:
                    ranked = run_system(system, row["query"], hybrid, engine,
                                        args.k)
                    m = evaluate_one(ranked, gold)
                    results[system].append(m)
                    results_lang[(system, lang)].append(m)
                except Exception as e:
                    log.warning("[%s] %s failed on %r: %s", lang, system,
                                row["query"][:40], e)
            if (i + 1) % 25 == 0:
                log.info("[%s] %d/%d", lang, i + 1, len(lang_rows))

    summary = {s: aggregate(results[s]) for s in systems if results[s]}
    header = f"{'system':<13}" + "".join(
        f"{m:>10}" for m in ("R@5", "R@10", "MRR@10", "nDCG@10", "Hit@3", "Hit@10"))
    print(header)
    keymap = ("recall@5", "recall@10", "mrr@10", "ndcg@10", "hit@3", "hit@10")
    for s in systems:
        if s not in summary:
            continue
        print(f"{s:<13}" + "".join(
            f"{summary[s][m]['mean']:>10.3f}" for m in keymap))
    if len(by_lang) > 1:
        for lang in sorted(by_lang):
            print(f"-- {lang} --")
            for s in systems:
                agg = aggregate(results_lang.get((s, lang), []))
                if agg:
                    print(f"{s:<13}" + "".join(
                        f"{agg[m]['mean']:>10.3f}" for m in keymap))

    if args.out_json:
        Path(args.out_json).write_text(json.dumps(summary, indent=2),
                                       encoding="utf-8")
    if args.out_csv:
        lines = ["system," + ",".join(keymap)]
        for s in systems:
            if s in summary:
                lines.append(s + "," + ",".join(
                    f"{summary[s][m]['mean']:.4f}" for m in keymap))
        Path(args.out_csv).write_text("\n".join(lines), encoding="utf-8")


if __name__ == "__main__":
    main()
