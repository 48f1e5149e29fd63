"""Metrics formulas + synthetic-data quality gates."""

import math

from legalrag_tpu.evals import aggregate, evaluate_one, mrr_at_k, ndcg_at_k
from scripts.generate_synthetic_data import (
    extractive_queries,
    quality_ok,
    strip_citations,
)


def test_metric_formulas():
    ranked = ["a", "b", "gold", "c"]
    m = evaluate_one(ranked, "gold")
    assert m["hit@3"] == 1.0
    assert m["recall@5"] == 1.0
    assert m["mrr@10"] == 1 / 3
    assert m["ndcg@10"] == 1 / math.log2(4)
    miss = evaluate_one(["x", "y"], "gold")
    assert all(v == 0.0 for v in miss.values())


def test_mrr_ndcg_rank1():
    assert mrr_at_k(["g"], "g", 10) == 1.0
    assert ndcg_at_k(["g"], "g", 10) == 1.0
    assert mrr_at_k([], "g", 10) == 0.0


def test_aggregate():
    agg = aggregate([{"m": 1.0}, {"m": 0.0}])
    assert agg["m"]["mean"] == 0.5
    assert agg["m"]["n"] == 2
    assert abs(agg["m"]["std"] - 0.5) < 1e-9
    assert aggregate([]) == {}


def test_strip_citations_and_gates():
    assert "第五百条" not in strip_citations("依照第五百条的规定处理")
    assert "§ 2-201" not in strip_citations("see § 2-201 for details")
    assert quality_ok("合同解除后价款应当如何返还给买受人", "zh")
    assert not quality_ok("第五条 本法适用于民事活动", "zh")   # article-like
    assert not quality_ok("这是什么", "zh")                    # deictic+short
    assert not quality_ok("see Section 2-201 of the act please", "en")


def test_extractive_generation(zh_chunks):
    rows = extractive_queries(zh_chunks[:80], n=20, seed=0)
    assert len(rows) == 20
    for r in rows:
        assert r["lang"] == "zh"
        assert quality_ok(r["query"], "zh")
        assert any(c.article_id == r["article_id"] for c in zh_chunks[:80])
