"""LLM generator+judge synthetic-data mode, exercised with stub clients
(VERDICT r1 coverage gap: the mode had never executed — no provider in this
image). Reference flow: ``generate_synthetic_data.py:225-341,578-594`` —
generate per sampled article, quality-gate, judge-score 1-10, rewrite-once
below threshold, keep ≥7, dedup.
"""

import re

from scripts.generate_synthetic_data import (
    dedup_by_embedding,
    llm_queries,
)
from legalrag_tpu.config import AppConfig


class StubGenerator:
    """Emits lang-appropriate questions; every other one is deliberately
    low-quality (too short) to exercise the quality gate."""

    def __init__(self):
        self.calls = 0

    def chat(self, messages, tag="chat", **kw):
        self.calls += 1
        prompt = messages[0]["content"]
        m = re.search(r"第[^条]{1,12}条", prompt)
        anchor = m.group(0) if m else "goods"
        if "Make the question more specific" in prompt:
            return f"在买卖合同中，{anchor}规定的风险负担如何在交付前后分配？" \
                if m else f"How does {anchor} allocate risk of loss before delivery?"
        if self.calls % 3 == 0:
            return "为什么？"  # fails the quality gate (too short / no anchor)
        return (f"根据{anchor}的规定，买卖合同标的物毁损灭失的风险由谁承担？"
                if m else
                f"Under {anchor}, who bears the risk of loss for the goods?")


class StubJudge:
    """Scores 5 on first sight of a query, 9 on the rewrite — drives the
    rewrite-once path; every other query passes immediately."""

    def __init__(self):
        self.seen = 0

    def chat(self, messages, tag="chat", **kw):
        self.seen += 1
        return "9" if self.seen % 2 else "5"


def test_llm_generator_judge_flow(zh_chunks):
    rows = llm_queries(zh_chunks[:40], n=8, seed=0,
                       client=StubGenerator(), judge=StubJudge())
    assert len(rows) == 8
    for r in rows:
        assert r["score"] >= 7
        assert r["lang"] == "zh"
        assert r["article_id"]
        assert len(r["query"]) >= 8
        assert "第" in r["query"] or "风险" in r["query"]


def test_judge_rejections_drop_articles(zh_chunks):
    class HarshJudge:
        def chat(self, messages, tag="chat", **kw):
            return "3"

    rows = llm_queries(zh_chunks[:10], n=10, seed=0,
                       client=StubGenerator(), judge=HarshJudge())
    assert rows == []


def test_dedup_after_llm_generation(zh_chunks):
    gen, judge = StubGenerator(), StubJudge()
    rows = llm_queries(zh_chunks[:40], n=8, seed=0, client=gen, judge=judge)
    rows = rows + [dict(rows[0])]          # exact duplicate
    kept = dedup_by_embedding(rows, AppConfig())
    assert len(kept) < len(rows)
