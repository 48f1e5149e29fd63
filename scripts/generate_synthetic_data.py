"""CLI: synthetic eval-set generation (queries with gold article ids).

Capability parity with reference ``scripts/generate_synthetic_data.py``:
an LLM generator+judge pipeline — per sampled article, role-conditioned
questions; judge scores 1-10 with one rewrite below threshold; quality
gates rejecting citation-bearing / article-like / non-question / deictic
text; embedding dedup at cosine ≥ 0.85 — writing JSONL rows
``{query, lang, role, article_id, score}`` (reference
``generate_synthetic_data.py:225-789``).

Adds an ``--mode extractive`` generator (no LLM required): questions are
formed from article sentences with citation stripping and lexical
perturbations — this is what CI and weight-less environments use.
"""

from __future__ import annotations

import argparse
import json
import random
import re
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from legalrag_tpu.config import AppConfig
from legalrag_tpu.corpus import load_chunks_from_dir
from legalrag_tpu.llm.client import LLMClient
from legalrag_tpu.schemas import LawChunk
from legalrag_tpu.utils import detect_lang, get_logger

log = get_logger("generate_synthetic_data")

ROLES = ("citizen", "lawyer", "judge", "student")

_CITATION_ZH = re.compile(r"(本法|依照|根据)?第[零一二三四五六七八九十百千万\d]+条")
_CITATION_EN = re.compile(r"(§+\s*[\dA-Za-z.-]+|[Ss]ection\s+[\dA-Za-z.-]+)")
_DEICTIC = re.compile(r"^(这|那|该|此|it|this|that)\b", re.IGNORECASE)


def strip_citations(text: str) -> str:
    return _CITATION_EN.sub("", _CITATION_ZH.sub("", text)).strip()


def quality_ok(query: str, lang: str) -> bool:
    """Gates from the reference: no citations, question-like or fact-anchored,
    not deictic, not a verbatim article, bounded length."""
    q = query.strip()
    if not (8 <= len(q) <= 120):
        return False
    if _CITATION_ZH.search(q) or _CITATION_EN.search(q):
        return False
    if _DEICTIC.match(q):
        return False
    if lang == "zh" and re.match(r"^第.{1,8}条", q):
        return False  # article-like
    return True


# ---------------------------------------------------------------- extractive
def extractive_queries(chunks: List[LawChunk], n: int, seed: int,
                       per_article: int = 1, hardness: float = 0.0
                       ) -> List[Dict]:
    """``hardness`` ∈ [0, 1): additionally drop that fraction of the
    remaining tokens, degrading lexical overlap with the gold article —
    the stress variant of the eval set."""
    from legalrag_tpu.tokenize import tokenize as _tok

    rng = random.Random(seed)
    rows: List[Dict] = []
    order = list(range(len(chunks)))
    rng.shuffle(order)
    for idx in order:
        c = chunks[idx]
        lang = c.lang or detect_lang(c.text)
        body = strip_citations(c.text)
        sents = [s.strip() for s in re.split(r"[。；！？.\n;!?]", body)
                 if 10 <= len(s.strip()) <= 90]
        rng.shuffle(sents)
        added = 0
        for s in sents:
            # drop a random clause to avoid verbatim self-retrieval
            parts = re.split(r"[，,]", s)
            if len(parts) > 2:
                del parts[rng.randrange(len(parts))]
                s = "，".join(parts) if lang == "zh" else ", ".join(parts)
            if hardness > 0:
                toks = _tok(s, lang)
                kept = [t for t in toks if rng.random() >= hardness]
                if len(kept) < 4:
                    continue
                s = ("" if lang == "zh" else " ").join(kept)
            if not quality_ok(s, lang):
                continue
            rows.append({"query": s, "lang": lang, "role": "extractive",
                         "article_id": c.article_id, "score": None})
            added += 1
            if added >= per_article:
                break
        if len(rows) >= n:
            break
    return rows[:n]


# ----------------------------------------------------------------- llm mode
GEN_PROMPT = {
    "zh": ("你是一名{role}。请根据下面的法条内容，提出一个自然的中文法律问题，"
           "该问题的答案应当由这条法条给出。不要提及条文编号。只输出问题本身。\n"
           "法条：{text}"),
    "en": ("You are a {role}. Based on the statutory provision below, ask one "
           "natural legal question whose answer is given by this provision. "
           "Do not mention the section number. Output only the question.\n"
           "Provision: {text}"),
}
JUDGE_PROMPT = (
    "Rate how well this question is answered by the provision, 1-10. "
    "Return ONLY the integer.\nQuestion: {q}\nProvision: {text}")


def llm_queries(chunks: List[LawChunk], n: int, seed: int, client: LLMClient,
                judge: LLMClient, min_score: int = 7) -> List[Dict]:
    rng = random.Random(seed)
    rows: List[Dict] = []
    pool = list(chunks)
    rng.shuffle(pool)
    for c in pool:
        if len(rows) >= n:
            break
        lang = c.lang or detect_lang(c.text)
        role = rng.choice(ROLES)
        prompt = GEN_PROMPT[lang if lang in GEN_PROMPT else "en"].format(
            role=role, text=c.text[:1200])
        q = strip_citations(client.chat(
            [{"role": "user", "content": prompt}], tag="gen").strip())
        if not quality_ok(q, lang):
            continue
        score = _judge_score(judge, q, c.text)
        if score < min_score:
            q2 = strip_citations(client.chat(
                [{"role": "user",
                  "content": prompt + "\n(Make the question more specific.)"}],
                tag="gen").strip())
            if quality_ok(q2, lang):
                s2 = _judge_score(judge, q2, c.text)
                if s2 >= min_score:
                    q, score = q2, s2
        if score >= min_score:
            rows.append({"query": q, "lang": lang, "role": role,
                         "article_id": c.article_id, "score": score})
    return rows


def _judge_score(judge: LLMClient, q: str, text: str) -> int:
    raw = judge.chat([{"role": "user",
                       "content": JUDGE_PROMPT.format(q=q, text=text[:1200])}],
                     tag="judge")
    m = re.search(r"\d+", raw or "")
    return int(m.group(0)) if m else 0


# -------------------------------------------------------------------- dedup
def dedup_by_embedding(rows: List[Dict], cfg: AppConfig,
                       threshold: float = 0.85) -> List[Dict]:
    """Greedy cosine dedup. All queries of a language are encoded in ONE
    batched call (one device execution per language, not one per query —
    per-query eager ops cost a ~200 ms round trip each on remote backends)."""
    from legalrag_tpu.models.hash_encoder import HashEncoder

    vec_of: Dict[int, np.ndarray] = {}
    for lang in sorted({r["lang"] for r in rows}):
        idxs = [i for i, r in enumerate(rows) if r["lang"] == lang]
        enc = HashEncoder(lang=lang, dim=256, sketch_dim=4096)
        vecs = np.asarray(enc.encode_queries([rows[i]["query"] for i in idxs]))
        for i, v in zip(idxs, vecs):
            vec_of[i] = v

    kept: List[Dict] = []
    kept_vecs: Dict[str, List[np.ndarray]] = {}
    for i, row in enumerate(rows):
        prior = kept_vecs.setdefault(row["lang"], [])
        v = vec_of[i]
        if any(float(v @ u) >= threshold for u in prior):
            continue
        kept.append(row)
        prior.append(v)
    return kept


def main() -> None:
    from legalrag_tpu.utils.device import apply_force_cpu

    apply_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("auto", "llm", "extractive"),
                    default="auto")
    ap.add_argument("--hardness", type=float, default=0.0,
                    help="extractive mode: fraction of query tokens to drop")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lang", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = AppConfig.load()
    chunks = load_chunks_from_dir(cfg.paths.processed_dir)
    if args.lang:
        chunks = [c for c in chunks if c.lang == args.lang]
    if not chunks:
        log.error("no processed chunks; run scripts.preprocess_law first")
        sys.exit(1)

    mode = args.mode
    client = LLMClient.from_config(cfg)
    if mode == "auto":
        mode = "llm" if client.provider != "disabled" else "extractive"
    log.info("mode=%s over %d chunks", mode, len(chunks))

    if mode == "llm":
        rows = llm_queries(chunks, args.n, args.seed, client, client)
    else:
        rows = extractive_queries(chunks, args.n, args.seed,
                                  hardness=args.hardness)
    rows = dedup_by_embedding(rows, cfg)
    log.info("kept %d queries after quality gates + dedup", len(rows))

    out = Path(args.out or Path(cfg.paths.eval_dir) / "law_qa.jsonl")
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    log.info("wrote %s", out)


if __name__ == "__main__":
    main()
