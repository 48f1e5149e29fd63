"""CLI: raw statute text → per-language processed JSONL corpora.

Parity with reference ``scripts/preprocess_law.py`` ``main()``
(``preprocess_law.py:491-542``): walks raw ``.txt`` files, parses each with
line-vs-scan auto selection, splits records by language, and writes
``data/processed/law_{lang}.jsonl``.

Usage: python -m scripts.preprocess_law [--raw-dir D] [--out-dir D]
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

from legalrag_tpu.config import AppConfig
from legalrag_tpu.corpus import parse_auto, write_chunks_jsonl
from legalrag_tpu.utils import get_logger

log = get_logger("preprocess_law")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-dir", default=None)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    cfg = AppConfig.load()
    raw_dir = Path(args.raw_dir or cfg.paths.raw_dir)
    out_dir = Path(args.out_dir or cfg.paths.processed_dir)

    by_lang = defaultdict(list)
    txt_files = sorted(raw_dir.rglob("*.txt"))
    if not txt_files:
        log.warning("no raw .txt files under %s", raw_dir)
    for path in txt_files:
        text = path.read_text(encoding="utf-8", errors="replace")
        if not text.strip():
            continue
        records = parse_auto(text, source=path.name)
        log.info("%s: %d articles", path.name, len(records))
        for rec in records:
            by_lang[rec.lang].append(rec.to_chunk())

    for lang, chunks in sorted(by_lang.items()):
        out = out_dir / f"law_{lang}.jsonl"
        n = write_chunks_jsonl(chunks, out)
        log.info("wrote %d chunks -> %s", n, out)


if __name__ == "__main__":
    main()
