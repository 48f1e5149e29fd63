"""CLI: build the case-law index from ``data/raw/cases*.jsonl``
(realizes the reference's dead ``scripts/build_case_index.py``)."""

from __future__ import annotations

import argparse
from pathlib import Path

from legalrag_tpu.config import AppConfig
from legalrag_tpu.retrieval.case_retriever import CaseRetriever
from legalrag_tpu.utils import get_logger

log = get_logger("build_case_index")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None,
                    help="cases JSONL (default: data/raw/cases_<lang>.jsonl)")
    ap.add_argument("--lang", default="zh")
    args = ap.parse_args()

    cfg = AppConfig.load()
    path = Path(args.cases or Path(cfg.paths.raw_dir) / f"cases_{args.lang}.jsonl")
    if not path.exists():
        log.error("no case corpus at %s", path)
        return
    retriever = CaseRetriever.from_jsonl(path, cfg, args.lang)
    out = Path(cfg.paths.index_dir) / args.lang
    retriever.save(out)
    log.info("case index: %d cases -> %s", len(retriever.cases), out)


if __name__ == "__main__":
    main()
