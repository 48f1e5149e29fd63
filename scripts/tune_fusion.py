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
    ap.add_argument("--holdout", type=float, default=0.5,
                    help="fraction of queries held out of the sweep; the "
                    "winning config is scored on this unseen split "
                    "(VERDICT r2 #6: same-set tuning proves nothing). "
                    "0 disables the split.")
    ap.add_argument("--seed", type=int, default=0)
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

    # train/held-out split: tune on train, report on unseen queries
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(collected))
    n_hold = int(len(collected) * max(0.0, min(args.holdout, 0.9)))
    hold_idx = set(order[:n_hold].tolist())
    train = [c for i, c in enumerate(collected) if i not in hold_idx]
    held = [c for i, c in enumerate(collected) if i in hold_idx]

    def score_config(params: dict, split) -> float:
        per_query = []
        for gold, chans, aid in split:
            channels = [ChannelResult(ch, params[f"{ch}_weight"], rows_, s_)
                        for ch, (s_, rows_) in chans.items()]
            fused = fuse(channels, method=params["fusion_method"],
                         rrf_k=params["rrf_k"], alpha=params["rrf_alpha"])
            ranked = [aid[c.row] for c in fused[: args.top_k]]
            per_query.append(evaluate_one(ranked, gold))
        return aggregate(per_query)[args.metric]["mean"]

    # phase 2 (host): sweep the grid on the TRAIN split only
    keys = list(GRID)
    best = None
    n_cfg = int(np.prod([len(GRID[k]) for k in keys]))
    log.info("sweeping %d configurations over %d train queries "
             "(%d held out)", n_cfg, len(train), len(held))
    for values in itertools.product(*(GRID[k] for k in keys)):
        params = dict(zip(keys, values))
        score = score_config(params, train)
        if best is None or score > best[0]:
            best = (score, params)
            log.info("new best train %s=%.4f: %s", args.metric, score,
                     params)

    train_score, params = best
    r = cfg.retrieval
    default_params = {
        "dense_weight": r.dense_weight, "bm25_weight": r.bm25_weight,
        "colbert_weight": r.colbert_weight, "rrf_k": r.rrf_k,
        "rrf_alpha": r.rrf_alpha, "fusion_method": r.fusion_method,
    }
    out = {"metric": args.metric, "train": round(train_score, 4),
           "params": params, "n_train": len(train), "n_held": len(held)}
    if held:
        held_score = score_config(params, held)
        default_held = score_config(default_params, held)
        out.update({"held": round(held_score, 4),
                    "default_held": round(default_held, 4),
                    "gain_held": round(held_score - default_held, 4)})
        log.info("held-out %s: tuned %.4f vs default %.4f (gain %+.4f)",
                 args.metric, held_score, default_held,
                 held_score - default_held)
    print(json.dumps(out, ensure_ascii=False))
    if args.out:
        if held and out["gain_held"] <= 0:
            log.warning("tuned config does NOT beat the default on the "
                        "held-out split — not writing %s", args.out)
        else:
            overlay = {"retrieval": params}
            Path(args.out).write_text(json.dumps(overlay, indent=2),
                                      encoding="utf-8")
            log.info("wrote config overlay -> %s", args.out)


if __name__ == "__main__":
    main()
