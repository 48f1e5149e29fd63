"""CLI: generation-quality evaluation (answers, not just retrieval).

Beyond-reference: the reference never scores its answers (its eval stops
at retrieval — reference ``scripts/evaluate_retrieval.py``). This runs
the synthetic QA sets end-to-end through retrieval + an answer provider
and reports, per provider and language:

- citation precision (refs supported by the retrieved hits — the same
  ``verify_citations`` guardrail serving attaches to every answer)
- citation recall (the gold article is cited and supported)
- faithfulness proxy (sentence-level lexical support rate)
- judge hook (``evals/generation.py`` — plugs in when a live provider
  is configured; absent in this zero-egress image)

Providers measurable in-image:
- ``extractive``: first-party deterministic answerer (quotes top
  provisions, conclusion first) — the content-ful analogue of the
  reference's degraded string; high scores expected.
- ``degraded``: the fixed unavailable-mode string (reference parity,
  reference ``llm/client.py:231-246``) — zero citations by design; the
  floor that shows the metrics discriminate.
- ``local-jax``: optional (--local-jax-layers N), a tiny RANDOM-INIT
  decoder through the real LLMClient seam — garbage text, near-zero
  scores; demonstrates the harness drives the production engine path.
  With real weights, this row becomes the headline.

``--schema N`` additionally measures schema-validity rate (valid JSON
with required keys) for constrained vs unconstrained decoding on N
items — the ``models/constrain.py`` contract, measurable without
pretrained weights.

Usage:
  python -m scripts.evaluate_generation [--limit 100] [--schema 8]
         [--local-jax-layers 2] [--out-json data/eval/generation.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path
from typing import Dict, List

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from legalrag_tpu.config import AppConfig
from legalrag_tpu.evals.generation import (aggregate_generation,
                                           evaluate_answer,
                                           extractive_answer,
                                           schema_validity)
from legalrag_tpu.graph import LawGraphStore
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.llm.client import DEGRADED_ANSWER
from legalrag_tpu.retrieval.hybrid import HybridRetriever
from legalrag_tpu.schemas import (IssueType, RoutingDecision, RoutingMode,
                                  TaskType)
from legalrag_tpu.utils import detect_lang, get_logger

log = get_logger("evaluate_generation")

COLS = ("citation_precision", "citation_recall", "support_rate",
        "cites_anything", "n_refs")


def load_rows(path: Path) -> List[dict]:
    rows = []
    with path.open("r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def make_local_jax_answerer(n_layers: int):
    """A tiny random-init decoder through the production LLMClient seam
    (provider=local-jax, engine injected) — the same path real weights
    take."""
    import jax

    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient
    from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
    from scripts.bench_decode import device_random_params

    cfg = DecoderConfig(num_hidden_layers=n_layers, hidden_size=128,
                        intermediate_size=256, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=32,
                        vocab_size=8192, max_position_embeddings=1024)
    params = device_random_params(cfg, jax.numpy.float32)

    class _ByteTok:
        """Byte-level fallback tokenizer (no HF tokenizers for random
        inits): ids = utf-8 bytes, decode best-effort."""

        eos_token_id = 0

        def encode(self, text, add_special_tokens=False):
            return [b % 8192 for b in text.encode("utf-8")][:768]

        def __call__(self, text, truncation=True, max_length=768,
                     **kw):
            # HF-callable seam used by LLMClient._stream_jax
            return {"input_ids": self.encode(text)[:max_length]}

        def decode(self, ids, skip_special_tokens=True):
            return bytes(int(i) % 256 for i in ids).decode(
                "utf-8", errors="replace")

        def apply_chat_template(self, messages, tokenize=False,
                                add_generation_prompt=True):
            return "\n".join(m.get("content", "") for m in messages)

    engine = JaxDecoderLM(params, cfg, tokenizer=_ByteTok(), max_len=1024,
                          decode_chunk=16)
    client = LLMClient(LLMConfig(provider="local-jax", max_new_tokens=96))
    client._local = engine
    return lambda question, prompt_text: client.chat(
        [{"role": "user", "content": prompt_text}], tag="answer")


def run_schema_check(n_items: int) -> Dict[str, float]:
    """Constrained vs unconstrained JSON validity on a tiny random-init
    decoder: the constraint machinery guarantees validity independent of
    weights; the unconstrained rate is the (near-zero) baseline."""
    import jax
    import numpy as np

    from legalrag_tpu.models.constrain import (JsonConstraint,
                                               build_schema_dfa)
    from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
    from scripts.bench_decode import device_random_params

    # compact schema format of models/constrain.py (fixed keys, all
    # required): key -> "string" | [sub] | {sub}
    schema = {"conclusion": "string", "article": "string"}
    # byte-level token table: token i = byte i (see tests/test_constrain)
    token_bytes = [bytes([i]) if i < 256 else None for i in range(512)]
    jc = JsonConstraint.from_schema(schema, token_bytes)
    trans, acc = build_schema_dfa(schema)

    def valid_prefix(text: str) -> bool:
        st = 0
        for b in text.encode("utf-8"):
            st = int(trans[st, b])
            if st < 0:
                return False
        return True

    cfg = DecoderConfig(num_hidden_layers=2, hidden_size=64,
                        intermediate_size=128, num_attention_heads=2,
                        num_key_value_heads=1, head_dim=32,
                        vocab_size=512, max_position_embeddings=1024)
    params = device_random_params(cfg, jax.numpy.float32)
    lm = JaxDecoderLM(params, cfg, max_len=1024, decode_chunk=8,
                      json_constraint=jc)
    rng = np.random.default_rng(0)
    pref_c = done_c = ok_u = 0
    for i in range(n_items):
        prompt = rng.integers(33, 127, 64).tolist()
        for constrain in (True, False):
            toks = list(lm.generate_stream(prompt, max_new_tokens=512,
                                           constrain=constrain,
                                           temperature=0.8, eos_id=0,
                                           seed=i))
            text = bytes(t % 256 for t in toks).decode("utf-8",
                                                       errors="replace")
            if constrain:
                # the machinery's hard guarantee: every constrained
                # stream is a prefix of a schema-valid document...
                pref_c += valid_prefix(text)
                # ...and with budget to reach EOS, the full document
                done_c += schema_validity(text,
                                          ("conclusion", "article"))
            else:
                ok_u += schema_validity(text, ("conclusion", "article"))
    return {"n": n_items,
            "constrained_valid_prefix_rate": pref_c / n_items,
            "constrained_complete_rate": done_c / n_items,
            "unconstrained_valid_rate": ok_u / n_items}


def main() -> None:
    from legalrag_tpu.utils.device import apply_force_cpu

    apply_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-file", default=None)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--schema", type=int, default=0, metavar="N",
                    help="also measure constrained-vs-unconstrained JSON "
                    "schema validity on N sampled generations")
    ap.add_argument("--local-jax-layers", type=int, default=0,
                    help="also run a tiny random-init decoder through "
                    "the production local-jax client seam (garbage "
                    "text; demonstrates discrimination)")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    cfg = AppConfig.load()
    eval_path = Path(args.eval_file
                     or Path(cfg.paths.eval_dir) / "law_qa.jsonl")
    if not eval_path.exists():
        log.error("eval set not found: %s", eval_path)
        sys.exit(1)
    rows = load_rows(eval_path)
    if args.limit:
        rows = rows[: args.limit]

    by_lang: Dict[str, list] = defaultdict(list)
    for r in rows:
        by_lang[r.get("lang") or detect_lang(r["query"])].append(r)

    providers = ["extractive", "degraded"]
    local = None
    if args.local_jax_layers:
        local = make_local_jax_answerer(args.local_jax_layers)
        providers.append("local-jax-random")

    per: Dict[tuple, List[dict]] = defaultdict(list)
    for lang, lang_rows in sorted(by_lang.items()):
        lang_cfg = cfg.with_lang(lang)
        bundle = IndexBundle.load(lang_cfg.paths.lang_index_dir, lang_cfg,
                                  lang)
        graph = LawGraphStore(lang_cfg.paths.graph_file)
        hybrid = HybridRetriever(bundle, lang_cfg, graph_store=graph)
        decision = RoutingDecision(task_type=TaskType.JUDGE_STYLE,
                                   issue_type=IssueType.OTHER,
                                   mode=RoutingMode.GRAPH_AUGMENTED)
        log.info("[%s] %d queries", lang, len(lang_rows))
        for i, row in enumerate(lang_rows):
            q, gold = row["query"], str(row["article_id"])
            hits = hybrid.search(q, top_k=args.k, decision=decision)
            answers = {
                "extractive": extractive_answer(q, hits, lang),
                "degraded": DEGRADED_ANSWER[lang],
            }
            if local is not None:
                ctx = "\n".join(h.chunk.text[:400] for h in hits[:3])
                answers["local-jax-random"] = local(q, f"{ctx}\n\n{q}")
            for prov, ans in answers.items():
                per[(prov, lang)].append(evaluate_answer(
                    q, ans, hits, gold, lang, tau=args.tau))
            if (i + 1) % 25 == 0:
                log.info("[%s] %d/%d", lang, i + 1, len(lang_rows))

    summary: Dict[str, Dict] = {}
    hdr = f"{'provider':<18}{'lang':<6}" + "".join(f"{c:>20}" for c in COLS)
    print(hdr)
    for prov in providers:
        for lang in sorted(by_lang):
            agg = aggregate_generation(per.get((prov, lang), []))
            if not agg:
                continue
            summary[f"{prov}/{lang}"] = agg
            print(f"{prov:<18}{lang:<6}" + "".join(
                f"{agg.get(c, float('nan')):>20.3f}" for c in COLS))

    if args.schema:
        sc = run_schema_check(args.schema)
        summary["schema_validity"] = sc
        print(f"schema validity (n={sc['n']}): constrained prefix "
              f"{sc['constrained_valid_prefix_rate']:.2f} / complete "
              f"{sc['constrained_complete_rate']:.2f} vs unconstrained "
              f"{sc['unconstrained_valid_rate']:.2f}")

    if args.out_json:
        Path(args.out_json).write_text(json.dumps(summary, indent=2),
                                       encoding="utf-8")


if __name__ == "__main__":
    main()
