"""CLI demo: end-to-end question answering from the terminal.

The quick-look surface (fills the role of the reference's walkthrough
notebooks): routes, retrieves, prints hits with channel breakdowns, and
generates an answer (degraded mode prints the retrieval-only notice when no
LLM is configured).

Usage: python -m scripts.demo "夫妻离婚后财产如何分割" [--top-k 5] [--complex]
"""

from __future__ import annotations

import argparse

from legalrag_tpu.config import AppConfig
from legalrag_tpu.utils.device import apply_force_cpu


def main() -> None:
    apply_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("question")
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--complex", dest="complex_", action="store_true",
                    help="multistep decompose-retrieve-synthesize flow")
    args = ap.parse_args()

    cfg = AppConfig.load()
    if args.complex_:
        from legalrag_tpu.agents import LegalAgent

        ans = LegalAgent(cfg).answer_complex(args.question)
        hits, decision = ans.hits, None
    else:
        from legalrag_tpu.pipeline import RagPipeline

        pipe = RagPipeline(cfg)
        hits, decision = pipe.retrieve(args.question, top_k=args.top_k)
        ans = pipe.answer_from_hits(args.question, hits, decision)

    if decision is not None:
        print(f"routing: task={decision.task_type.value} "
              f"issue={decision.issue_type.value} mode={decision.mode.value} "
              f"k×{decision.top_k_factor}")
    print(f"\n== top {len(hits)} provisions ==")
    for h in hits:
        bd = h.score_breakdown or {}
        channels = ",".join(bd.get("channels") or list(
            (bd.get("per_channel") or {}).keys())) or bd.get("channel", "")
        print(f"[{h.rank}] {h.score:.3f} {h.chunk.law_name} "
              f"{h.chunk.article_no} ({channels})")
        print(f"    {h.chunk.text[:100]}...")
    print("\n== answer ==")
    print(ans.answer)


if __name__ == "__main__":
    main()
