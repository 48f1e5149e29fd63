"""Pipeline: retrieval flow, prompt building, degraded mode, streaming, gateway."""

import asyncio
import json

import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.llm.client import LLMClient
from legalrag_tpu.llm.gateway import LLMGateway
from legalrag_tpu.pipeline.rag_pipeline import RagPipeline
from legalrag_tpu.prompts import load_prompts
from legalrag_tpu.schemas import (
    IssueType, LawChunk, RetrievalHit, RoutingDecision, RoutingMode, TaskType,
)


class EchoLLM:
    """Records messages; returns canned text; streams in 3 chunks."""

    def __init__(self, reply="前言。结论：可以解除。分析：略。"):
        self.reply = reply
        self.messages = None
        self.cfg = AppConfig().llm

    def chat(self, messages, tag="chat", **kw):
        self.messages = messages
        return self.reply

    def chat_stream(self, messages, tag="chat", **kw):
        self.messages = messages
        for i in range(0, len(self.reply), 5):
            yield self.reply[i:i + 5]

    def degraded_answer(self, messages):
        return "degraded"

    is_degraded = False


def _hit(aid="563", text="第五百六十三条　当事人可以解除合同。", lang="zh"):
    return RetrievalHit(
        chunk=LawChunk(id=f"{lang}:x:{aid}", law_name="中华人民共和国民法典",
                       article_no=f"第{aid}条", article_id=aid, text=text,
                       lang=lang),
        score=0.9)


def _decision(task=TaskType.JUDGE_STYLE):
    return RoutingDecision(task_type=task, issue_type=IssueType.CONTRACT,
                           mode=RoutingMode.RAG)


def test_prompt_registries_complete():
    for lang in ("zh", "en"):
        p = load_prompts(lang)
        assert set(p["registry"]) == {t.value for t in TaskType} - {"other"}
        for tmpl in p["registry"].values():
            for field in ("system", "user_prefix", "output_structure",
                          "citation_rules", "format_constraints", "forbidden"):
                assert tmpl[field]
            assert "{question}" in tmpl["user_prefix"]
            assert "{law_context}" in tmpl["user_prefix"]
        assert len(p["example_pool"]) >= 6


def test_build_messages_zh():
    llm = EchoLLM()
    pipe = RagPipeline.__new__(RagPipeline)
    pipe.cfg = AppConfig()
    pipe.llm = llm
    msgs = pipe._build_messages("合同可以解除吗", [_hit()], _decision())
    assert msgs[0]["role"] == "system"
    assert "候选条文 1" in msgs[-1]["content"]
    assert "中华人民共和国民法典" in msgs[-1]["content"]
    assert "合同可以解除吗" in msgs[-1]["content"]
    # one few-shot example system message in between
    assert len(msgs) == 3


def test_answer_from_hits_trims():
    pipe = RagPipeline.__new__(RagPipeline)
    pipe.cfg = AppConfig()
    pipe.llm = EchoLLM()
    ans = pipe.answer_from_hits("合同可以解除吗", [_hit()], _decision())
    assert ans.answer.startswith("结论：")
    assert ans.hits


def test_stream_bridge():
    pipe = RagPipeline.__new__(RagPipeline)
    pipe.cfg = AppConfig()
    pipe.llm = EchoLLM()

    async def run():
        chunks = []
        async for c in pipe.answer_stream_from_hits("问题", [_hit()], _decision()):
            chunks.append(c)
        return "".join(chunks)

    out = asyncio.run(run())
    assert out == pipe.llm.reply


def test_degraded_mode_zh_en():
    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.llm.api_key = None
    client = LLMClient(cfg.llm)
    zh = client.chat([{"role": "user", "content": "合同问题"}])
    en = client.chat([{"role": "user", "content": "contract question"}])
    assert "检索" in zh
    assert "unavailable" in en or "showing" in en


def test_gateway_timeout_returns_degraded():
    class SlowLLM(EchoLLM):
        def chat(self, messages, tag="chat", **kw):
            import time
            time.sleep(2)
            return "late"

    slow = SlowLLM()
    slow.cfg.request_timeout = 0.2
    slow.cfg.max_retries = 1
    slow.cfg.retry_backoff = 0.01
    gw = LLMGateway(slow)
    out = gw.chat([{"role": "user", "content": "hi"}])
    assert out == "degraded"


def test_gateway_passthrough():
    gw = LLMGateway(EchoLLM())
    assert "结论" in gw.chat([{"role": "user", "content": "hi"}])


def test_keyed_client_cache():
    cfg = AppConfig()
    a = LLMClient.from_config_with_key(cfg, "sk-user-1")
    b = LLMClient.from_config_with_key(cfg, "sk-user-1")
    c = LLMClient.from_config_with_key(cfg, "sk-user-2")
    assert a is b and a is not c
    assert a.provider == "openai"


def test_local_jax_provider_degrades_without_weights():
    cfg = AppConfig()
    cfg.llm.provider = "local-jax"
    cfg.llm.model = "nonexistent/decoder-model"
    client = LLMClient(cfg.llm)
    out = client.chat([{"role": "user", "content": "contract question"}])
    assert "unavailable" in out or "showing" in out  # degraded, not a crash
