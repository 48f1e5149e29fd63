"""CLI: processed corpora → per-language device index bundles.

Parity with reference ``scripts/build_index.py:19-120``: loads all processed
chunks, groups by language, builds every channel per language, and supports
versioned builds with activation (``--index-version`` / ``--activate``).
Channel toggles map to bundle flags (dense+bm25 always; token channel via
``--no-colbert``).
"""

from __future__ import annotations

import argparse
import time
from collections import defaultdict
from pathlib import Path

from legalrag_tpu.config import AppConfig
from legalrag_tpu.corpus import load_chunks_from_dir
from legalrag_tpu.index import IndexBundle, IndexRegistry
from legalrag_tpu.utils import get_logger

log = get_logger("build_index")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--lang", default=None, help="build only this language")
    ap.add_argument("--no-colbert", action="store_true")
    ap.add_argument("--index-version", default=None)
    ap.add_argument("--activate", action="store_true")
    args = ap.parse_args()

    cfg = AppConfig.load(args.config)
    if args.no_colbert:
        cfg.retrieval.enable_colbert = False

    # Index building is host-prep plus small one-shot matmuls; running those
    # on the accelerator costs a fresh XLA compile per shape (tens of seconds
    # on remote-compile TPU setups) for zero benefit. Build on CPU; the
    # serving engine loads the artifacts onto the TPU.
    import jax

    build_device = jax.devices("cpu")[0]

    chunks = load_chunks_from_dir(cfg.paths.processed_dir)
    by_lang = defaultdict(list)
    for c in chunks:
        by_lang[c.lang or "zh"].append(c)
    if not by_lang:
        log.warning("no processed chunks under %s — run scripts.preprocess_law first",
                    cfg.paths.processed_dir)
        return

    for lang, lang_chunks in sorted(by_lang.items()):
        if args.lang and lang != args.lang:
            continue
        t0 = time.time()
        log.info("[%s] building index over %d chunks", lang, len(lang_chunks))
        bundle = IndexBundle.build_from_chunks(lang_chunks, cfg, lang,
                                               device=build_device)
        root = Path(cfg.paths.index_dir) / lang
        if args.index_version:
            out = IndexRegistry(root).versions_root() / args.index_version
        else:
            out = root
        bundle.save(out)
        if args.index_version and args.activate:
            IndexRegistry(root).activate(args.index_version)
            log.info("[%s] activated version %s", lang, args.index_version)
        log.info("[%s] done in %.1fs", lang, time.time() - t0)


if __name__ == "__main__":
    main()
