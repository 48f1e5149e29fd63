"""Routing: rule-based mode/task/factor decisions, issue extraction, LLM path."""

import json

from legalrag_tpu.routing import LegalIssueExtractor, QueryRouter, has_article_ref
from legalrag_tpu.schemas import IssueType, RoutingMode, TaskType


class DummyLLM:
    def __init__(self, payload):
        self.payload = payload
        self.calls = []

    def chat(self, messages, tag=None, **kw):
        self.calls.append((messages, tag))
        return self.payload


def test_article_ref_detection():
    assert has_article_ref("第五百条的规定是什么")
    assert has_article_ref("第五百零二条第一款")
    assert has_article_ref("What does Article 9 say")
    assert not has_article_ref("离婚需要什么手续")


def test_mode_graph_augmented_on_article_ref():
    r = QueryRouter()
    d = r.route("民法典第一千零四十五条如何规定亲属范围？")
    assert d.mode == RoutingMode.GRAPH_AUGMENTED
    assert "article_ref" in d.tags


def test_mode_rag_default():
    d = QueryRouter().route("我想买一套二手房需要注意什么")
    assert d.mode == RoutingMode.RAG


def test_task_ladder():
    r = QueryRouter()
    assert r.route("违约责任的构成要件有哪些").task_type == TaskType.ELEMENTS_CHECKLIST
    assert r.route("我是否可以解除合同").task_type == TaskType.JUDGE_STYLE
    assert r.route("什么是善意取得").task_type == TaskType.STATUTE_EXEGESIS
    assert r.route("签合同有什么风险").task_type == TaskType.RISK_ALERT
    assert r.route("定金和订金的区别").task_type == TaskType.COMPARATIVE_RULES
    assert r.route("起诉离婚需要什么证据材料清单").task_type == TaskType.PROCEDURE_EVIDENCE_LIST
    assert r.route("随便问问").task_type == TaskType.JUDGE_STYLE


def test_top_k_factor_broad():
    r = QueryRouter()
    assert r.route("继承人有哪些").top_k_factor == 1.35
    assert r.route("第十条有哪些规定").top_k_factor == 1.0  # article ref suppresses


def test_issue_extraction_priority():
    e = LegalIssueExtractor()
    assert e.extract("违约金过高怎么办").issue_type == IssueType.PENALTY_LIQUIDATED
    # 登记 (REGISTRATION) outranks 抵押 (MORTGAGE) in rule order
    assert e.extract("房屋抵押登记").issue_type == IssueType.REGISTRATION
    assert e.extract("离婚后财产怎么分").issue_type == IssueType.DIVORCE
    assert e.extract("what is unjust enrichment").issue_type == IssueType.UNJUST_ENRICHMENT
    out = e.extract("今天天气不错")
    assert out.issue_type == IssueType.OTHER


def test_part_fallback():
    out = LegalIssueExtractor().extract("遗产分配纠纷如何处理遗产")
    assert out.issue_type in (IssueType.INHERITANCE, IssueType.INHERITANCE_SHARE)
    assert any(t.startswith("part:") for t in out.tags)


def test_llm_routing_works():
    llm = DummyLLM(json.dumps({"task_type": "risk_alert",
                               "mode": "GRAPH_AUGMENTED", "top_k_factor": 1.2}))
    d = QueryRouter(llm=llm, llm_based=True).route("随便问问")
    assert d.task_type == TaskType.RISK_ALERT
    assert d.mode == RoutingMode.GRAPH_AUGMENTED
    assert d.top_k_factor == 1.2
    assert llm.calls and llm.calls[0][1] == "route"


def test_llm_routing_falls_back_on_garbage():
    d = QueryRouter(llm=DummyLLM("not json at all"), llm_based=True).route(
        "我是否可以解除合同")
    # extract_json returns {} → defaults come from rules
    assert d.task_type == TaskType.JUDGE_STYLE
    assert d.mode == RoutingMode.RAG
