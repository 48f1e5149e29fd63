"""CLI: corpus → n-gram draft table for speculative decoding.

Tokenizes the processed corpora (data/processed/law_*.jsonl) with the
serving model's tokenizer and builds the direct-mapped bigram →
continuation table the speculative engines probe when their in-sequence
prompt lookup misses (models/ngram_draft.py). The table is a serving
artifact like an index bundle: build offline on CPU, point
``llm.ngram_draft_path`` at the .npz.

The reference has no speculative decoding (HF ``model.generate``
token-by-token, reference ``llm/client.py:306-369``); this is a
TPU-serving acceleration artifact with no reference counterpart.

Usage:
    python -m scripts.build_draft_table --tokenizer <hf_dir_or_name> \
        [--input data/processed] [--out data/index/draft_table.npz] \
        [--k 8] [--log2-size 18] [--field text]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from legalrag_tpu.models.ngram_draft import NgramDraftTable
from legalrag_tpu.utils import get_logger
from legalrag_tpu.utils.device import apply_force_cpu

log = get_logger("build_draft_table")


def iter_texts(input_path: Path, field: str):
    files = ([input_path] if input_path.is_file()
             else sorted(input_path.glob("*.jsonl")))
    if not files:
        raise SystemExit(f"no .jsonl files under {input_path}")
    for f in files:
        n = 0
        with f.open(encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                txt = rec.get(field, "")
                if txt:
                    n += 1
                    yield txt
        log.info("%s: %d records", f.name, n)


def main() -> None:
    apply_force_cpu()  # offline artifact build stays on CPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer", required=True,
                    help="HF tokenizer dir/name (the serving model's)")
    ap.add_argument("--input", default="data/processed",
                    help="jsonl file or directory of jsonl files")
    ap.add_argument("--out", default="data/index/draft_table.npz")
    ap.add_argument("--field", default="text")
    ap.add_argument("--k", type=int, default=8,
                    help="draft length (must cover the engines' spec_k)")
    ap.add_argument("--log2-size", type=int, default=18,
                    help="table slots = 2**log2_size (18 -> 262k slots, "
                         "~10 MB at k=8)")
    args = ap.parse_args()

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    t0 = time.time()
    streams = (tok(t, add_special_tokens=False)["input_ids"]
               for t in iter_texts(Path(args.input), args.field))
    table = NgramDraftTable.from_streams(streams, k=args.k,
                                         log2_size=args.log2_size)
    table.save(args.out)
    st = table.stats()
    log.info("wrote %s in %.1fs: %s", args.out, time.time() - t0, st)
    print(json.dumps({"out": args.out, **st}))


if __name__ == "__main__":
    sys.exit(main())
