"""Corpus loading (parity: reference ``corpus_loader.py:22-39``).

Streams every ``*.jsonl`` file in a processed directory as LawChunk records,
deduplicating by chunk id (first occurrence wins, matching the reference's
dict-setdefault semantics). Also provides the JSONL writer used by the
preprocess CLI and the PDF ingestor.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Iterable, Iterator, List

from legalrag_tpu.schemas import LawChunk


def iter_chunks_from_file(path: str | Path) -> Iterator[LawChunk]:
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield LawChunk.model_validate_json(line)


def load_chunks_from_dir(processed_dir: str | Path, lang: str | None = None) -> List[LawChunk]:
    seen: set[str] = set()
    out: List[LawChunk] = []
    d = Path(processed_dir)
    if not d.exists():
        return out
    for path in sorted(d.glob("*.jsonl")):
        for chunk in iter_chunks_from_file(path):
            if lang is not None and chunk.lang != lang:
                continue
            if chunk.id in seen:
                continue
            seen.add(chunk.id)
            out.append(chunk)
    return out


def write_chunks_jsonl(chunks: Iterable[LawChunk], path: str | Path) -> int:
    """Atomic write (tmp + os.replace, matching the reference's publish
    pattern, e.g. ``graph_builder.py:204,461``)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    n = 0
    with open(tmp, "w", encoding="utf-8") as f:
        for c in chunks:
            f.write(c.model_dump_json(exclude_none=True) + "\n")
            n += 1
    os.replace(tmp, path)
    return n
