"""Multistep pipeline, LegalAgent, and case-law retrieval."""

import json

import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.pipeline.multistep import MultistepPipeline
from legalrag_tpu.retrieval.case_retriever import CaseRetriever
from legalrag_tpu.schemas import CaseEntry


class FakePipeline:
    """Stand-in RagPipeline: retrieval returns canned hits per question."""

    def __init__(self):
        self.llm = None
        self.retrieved = []

    def retrieve(self, question, top_k=None):
        from legalrag_tpu.schemas import LawChunk, RetrievalHit

        self.retrieved.append(question)
        chunk = LawChunk(id=f"zh:t:{len(self.retrieved)}", law_name="法",
                         article_no="第1条", article_id=str(len(self.retrieved)),
                         text=f"与「{question[:10]}」相关的条文", lang="zh")
        return [RetrievalHit(chunk=chunk, score=0.9,
                             score_breakdown={"channel": "dense"})], None

    def answer_from_hits(self, question, hits, decision=None, llm=None):
        from legalrag_tpu.schemas import RagAnswer

        return RagAnswer(question=question, answer=f"答：{len(hits)}条依据",
                         hits=hits)


class JsonLLM:
    is_degraded = False

    def __init__(self, subs):
        self.subs = subs

    def chat(self, messages, tag=None, **kw):
        return json.dumps({"sub_questions": self.subs}, ensure_ascii=False)


def test_heuristic_decompose_zh():
    ms = MultistepPipeline(FakePipeline())
    subs = ms.decompose("合同无效的情形有哪些；另外，无效后财产如何处理？")
    assert len(subs) == 2
    assert "合同无效" in subs[0]
    # atomic question stays whole
    assert ms.decompose("什么是善意取得") == ["什么是善意取得"]


def test_llm_decompose_used_when_available():
    pipe = FakePipeline()
    pipe.llm = JsonLLM(["问题甲如何处理", "问题乙如何处理"])
    ms = MultistepPipeline(pipe)
    subs = ms.decompose("复杂问题")
    assert subs == ["问题甲如何处理", "问题乙如何处理"]


def test_answer_complex_merges_hits():
    pipe = FakePipeline()
    ms = MultistepPipeline(pipe)
    ans = ms.answer_complex("合同无效的情形有哪些；另外，无效后财产如何处理？")
    assert len(pipe.retrieved) == 2  # one retrieval per sub-question
    assert len(ans.hits) == 2
    assert ans.question.startswith("合同无效")


@pytest.fixture(scope="module")
def case_retriever():
    cfg = AppConfig()
    cfg.engine.capacity_round = 64
    cases = [
        CaseEntry(case_id="c1", title="买卖合同纠纷案", court="北京一中院",
                  date="2022-03-01", cause="买卖合同纠纷",
                  text="出卖人迟延交付货物，买受人主张解除合同并要求赔偿损失。"),
        CaseEntry(case_id="c2", title="离婚后财产分割案", court="上海二中院",
                  date="2023-06-10", cause="离婚纠纷",
                  text="离婚后一方隐藏夫妻共同财产，另一方请求重新分割。"),
        CaseEntry(case_id="c3", title="借款合同纠纷案", court="北京一中院",
                  date="2021-01-15", cause="借款合同纠纷",
                  text="借款人未按期还款，贷款人请求支付本金和利息违约金。"),
    ]
    r = CaseRetriever(cfg, "zh")
    r.add_cases(cases)
    return r


def test_case_search_relevance(case_retriever):
    hits = case_retriever.search("离婚后发现对方隐藏财产怎么办", top_k=2)
    assert hits and hits[0].case.case_id == "c2"
    assert hits[0].score_breakdown


def test_case_metadata_filters(case_retriever):
    hits = case_retriever.search("合同纠纷", top_k=3, court="北京一中院")
    assert {h.case.case_id for h in hits} <= {"c1", "c3"}
    hits = case_retriever.search("合同纠纷", top_k=3, date_from="2022-01-01")
    assert {h.case.case_id for h in hits} <= {"c1", "c2"}
    assert case_retriever.search("合同", top_k=3, court="不存在法院") == []


def test_case_dedup_and_save_load(case_retriever, tmp_path):
    assert case_retriever.add_cases([case_retriever.cases[0]]) == 0
    case_retriever.save(tmp_path)
    loaded = CaseRetriever.load(tmp_path, case_retriever.cfg, "zh")
    assert len(loaded.cases) == 3
    hits = loaded.search("离婚后财产", top_k=1)
    assert hits[0].case.case_id == "c2"
