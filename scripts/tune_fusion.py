"""CLI: evaluation-driven fusion-parameter tuning.

Collects each query's per-channel top-k lists ONCE (device work), then
sweeps fusion parameters (channel weights, rrf_k, α, method) entirely on
the host — fusion over ≤3·eff_k candidates costs microseconds, so the grid
is thousands of configurations per second. Reports the best configuration
by the chosen metric and optionally writes a config overlay JSON consumable
by ``AppConfig.load(path)``.

Usage: python -m scripts.tune_fusion [--eval-file …] [--metric mrr@10]
       [--out config_tuned.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

from legalrag_tpu.config import AppConfig
from legalrag_tpu.evals import aggregate, evaluate_one
from legalrag_tpu.retrieval.fusion import ChannelResult, fuse
from legalrag_tpu.utils import detect_lang, get_logger
from legalrag_tpu.utils.device import apply_force_cpu

log = get_logger("tune_fusion")

GRID = {
    "dense_weight": (0.4, 0.5, 0.6, 0.7),
    "bm25_weight": (0.3, 0.4, 0.5),
    "colbert_weight": (0.2, 0.35, 0.5),
    "rrf_k": (20, 60, 100),
    "rrf_alpha": (0.3, 0.5, 0.7),
    "fusion_method": ("rrf_norm_blend", "wrrf", "weighted_sum"),
}


def main() -> None:
    apply_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-file", default=None)
    ap.add_argument("--metric", default="mrr@10")
    ap.add_argument("--eff-k", type=int, default=40)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--limit", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from legalrag_tpu.index.bundle import IndexBundle
    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    cfg = AppConfig.load()
    eval_path = Path(args.eval_file or Path(cfg.paths.eval_dir) / "law_qa.jsonl")
    if not eval_path.exists():
        log.error("no eval set at %s", eval_path)
        sys.exit(1)
    rows = [json.loads(l) for l in eval_path.read_text(encoding="utf-8")
            .splitlines() if l.strip()][: args.limit]

    # phase 1 (device): per-channel lists per query, collected once
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.get("lang") or detect_lang(r["query"])].append(r)
    collected = []  # (gold, {channel: (scores, rows)}, row->article_id map)
    for lang, lang_rows in sorted(by_lang.items()):
        lang_cfg = cfg.with_lang(lang)
        bundle = IndexBundle.load(lang_cfg.paths.lang_index_dir, lang_cfg, lang)
        hybrid = HybridRetriever(bundle, lang_cfg)
        aid = [c.article_id for c in bundle.chunks]
        log.info("[%s] collecting channel lists for %d queries", lang,
                 len(lang_rows))
        for r in lang_rows:
            one = hybrid._channels_topk_all(r["query"], args.eff_k)
            if one is None:
                continue
            one.pop("qvec", None)
            collected.append((str(r["article_id"]),
                              {ch: (s[0], i[0]) for ch, (s, i) in one.items()},
                              aid))

    # phase 2 (host): sweep the grid
    keys = list(GRID)
    best = None
    n_cfg = int(np.prod([len(GRID[k]) for k in keys]))
    log.info("sweeping %d configurations over %d queries", n_cfg,
             len(collected))
    for values in itertools.product(*(GRID[k] for k in keys)):
        params = dict(zip(keys, values))
        per_query = []
        for gold, chans, aid in collected:
            channels = [ChannelResult(ch, params[f"{ch}_weight"], rows_, s_)
                        for ch, (s_, rows_) in chans.items()]
            fused = fuse(channels, method=params["fusion_method"],
                         rrf_k=params["rrf_k"], alpha=params["rrf_alpha"])
            ranked = [aid[c.row] for c in fused[: args.top_k]]
            per_query.append(evaluate_one(ranked, gold))
        score = aggregate(per_query)[args.metric]["mean"]
        if best is None or score > best[0]:
            best = (score, params)
            log.info("new best %s=%.4f: %s", args.metric, score, params)

    score, params = best
    print(json.dumps({"metric": args.metric, "value": round(score, 4),
                      "params": params}, ensure_ascii=False))
    if args.out:
        overlay = {"retrieval": params}
        Path(args.out).write_text(json.dumps(overlay, indent=2),
                                  encoding="utf-8")
        log.info("wrote config overlay -> %s", args.out)


if __name__ == "__main__":
    main()
