"""CLI: build the law graph per language (parity: reference
``scripts/build_graph.py:12-25``)."""

from __future__ import annotations

import argparse
from collections import defaultdict

from legalrag_tpu.config import AppConfig
from legalrag_tpu.corpus import load_chunks_from_dir
from legalrag_tpu.graph import GraphBuilder
from legalrag_tpu.utils import get_logger

log = get_logger("build_graph")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--lang", default=None)
    args = ap.parse_args()

    cfg = AppConfig.load(args.config)
    chunks = load_chunks_from_dir(cfg.paths.processed_dir)
    by_lang = defaultdict(list)
    for c in chunks:
        by_lang[c.lang or "zh"].append(c)
    for lang, lang_chunks in sorted(by_lang.items()):
        if args.lang and lang != args.lang:
            continue
        out = cfg.with_lang(lang).paths.graph_file
        GraphBuilder().build_to_file(lang_chunks, out)
        log.info("[%s] graph -> %s", lang, out)


if __name__ == "__main__":
    main()
