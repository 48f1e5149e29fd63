"""HybridRetriever end-to-end over a real-corpus bundle + graph."""

import numpy as np
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.graph import GraphBuilder, LawGraphStore
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.retrieval.hybrid import HybridRetriever, dedup_keep_best
from legalrag_tpu.schemas import (
    IssueType,
    RetrievalHit,
    RoutingDecision,
    RoutingMode,
    TaskType,
)


@pytest.fixture(scope="module")
def hybrid(en_chunks, tmp_path_factory):
    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    chunks = en_chunks[:150]
    bundle = IndexBundle.build_from_chunks(chunks, cfg, "en")
    gpath = tmp_path_factory.mktemp("graph") / "g.jsonl"
    GraphBuilder().build_to_file(chunks, gpath)
    return HybridRetriever(bundle, cfg, graph_store=LawGraphStore(gpath))


def _decision(mode=RoutingMode.RAG):
    return RoutingDecision(task_type=TaskType.JUDGE_STYLE,
                           issue_type=IssueType.OTHER, mode=mode)


def test_search_returns_ranked_hits(hybrid):
    hits = hybrid.search("buyer in ordinary course of business security interest",
                         top_k=5, decision=_decision())
    assert hits and len(hits) <= 5
    # both §1-201 and §2A-103 define "buyer in ordinary course of business"
    assert "buyer in ordinary course" in hits[0].chunk.text.lower()
    assert [h.rank for h in hits] == list(range(1, len(hits) + 1))
    scores = [h.score for h in hits]
    assert scores == sorted(scores, reverse=True)


def test_breakdown_explainability(hybrid):
    hits = hybrid.search("negotiable instrument payable to bearer", top_k=5,
                         decision=_decision())
    bd = hits[0].score_breakdown
    assert bd and "per_channel" in bd
    assert set(bd["per_channel"]) & {"dense", "bm25", "colbert"}
    assert "rerank_norm" in bd  # rerank ran


def test_graph_augmented_adds_graph_hits(hybrid):
    plain = hybrid.search("scope of article general provisions", top_k=10,
                          decision=_decision())
    aug = hybrid.search("scope of article general provisions", top_k=10,
                        decision=_decision(RoutingMode.GRAPH_AUGMENTED))
    assert len(aug) >= len(plain) - 2  # graph hits may displace others
    # at least the search ran the graph stage without error; graph-source
    # hits carry depth metadata when they appear
    for h in aug:
        if h.source == "graph":
            assert h.graph_depth is not None


def test_channel_apis(hybrid):
    assert hybrid.search_dense("security interest", 3)
    assert hybrid.search_bm25("security interest", 3)
    assert hybrid.search_colbert("security interest", 3)
    g = hybrid.search_graph("security interest", ["1-201"], 5)
    assert all(h.source == "graph" for h in g)


def test_dedup_keep_best_unions_provenance():
    from legalrag_tpu.schemas import LawChunk

    c = LawChunk(id="x", law_name="L", article_no="§ 1", article_id="1",
                 text="t", lang="en")
    h1 = RetrievalHit(chunk=c, score=0.9,
                      score_breakdown={"channel": "dense",
                                       "channel_contrib": {"dense": 0.5}})
    h2 = RetrievalHit(chunk=c, score=0.7,
                      score_breakdown={"channel": "graph",
                                       "channel_contrib": {"graph": 0.2}})
    out = dedup_keep_best([h1, h2])
    assert len(out) == 1
    assert out[0].score == 0.9
    assert set(out[0].score_breakdown["channels"]) == {"dense", "graph"}
    assert out[0].score_breakdown["channel_contrib"] == {"dense": 0.5,
                                                         "graph": 0.2}


def test_min_score_filter(hybrid):
    hybrid.cfg.retrieval.min_final_score = 0.99
    try:
        hits = hybrid.search("completely unrelated zebra astronomy query",
                             top_k=5, decision=_decision())
        assert all(h.score >= 0.99 for h in hits) or hits == []
    finally:
        hybrid.cfg.retrieval.min_final_score = 0.2


def test_hyde_expands_dense_query(hybrid):
    class HydeLLM:
        is_degraded = False
        calls = []

        def chat(self, messages, tag=None, **kw):
            HydeLLM.calls.append(tag)
            return "A buyer in ordinary course takes free of security interests."

    hybrid.llm = HydeLLM()
    hybrid.cfg.retrieval.enable_hyde = True
    try:
        hits = hybrid.search("who takes free of a security interest",
                             top_k=5, decision=_decision())
        assert hits
        assert "hyde" in HydeLLM.calls
    finally:
        hybrid.cfg.retrieval.enable_hyde = False
        hybrid.llm = None


def test_llm_reranker_used_when_configured(hybrid):
    import json

    from legalrag_tpu.retrieval.rerankers import RerankerFactory

    class ScoreLLM:
        is_degraded = False

        def chat(self, messages, tag=None, **kw):
            n = messages[-1]["content"].count("[")
            return json.dumps({"scores": [0.9] * n})

    hybrid.cfg.retrieval.rerank_use_llm = True
    try:
        rr = RerankerFactory.create(hybrid.cfg, hybrid.bundle, llm=ScoreLLM(),
                                    top_k=5)
        assert rr.name == "llm"
        scores = rr.score("q", ["doc a", "doc b"])
        assert scores == [0.9, 0.9]
    finally:
        hybrid.cfg.retrieval.rerank_use_llm = False


def test_one_shot_channels_match_per_channel(hybrid):
    q = "security interest attaches when value is given"
    eff_k = 16
    one = hybrid._channels_topk_all(q, eff_k)
    assert one is not None
    assert set(one) == {"dense", "bm25", "colbert", "qvec"}
    ds, dr = hybrid.dense.search_rows([q], eff_k)
    bs, br = hybrid.bm25.search_rows([q], eff_k)
    ls, lr = hybrid.late.search_rows([q], eff_k)
    np.testing.assert_allclose(one["dense"][0][0], ds[0], rtol=1e-4, atol=1e-4)
    assert (one["dense"][1][0] == dr[0]).all()
    np.testing.assert_allclose(one["bm25"][0][0], bs[0], rtol=1e-4, atol=1e-4)
    assert (one["bm25"][1][0] == br[0]).all()
    np.testing.assert_allclose(one["colbert"][0][0], ls[0], rtol=1e-3, atol=1e-3)
    assert (one["colbert"][1][0] == lr[0]).all()


@pytest.fixture(scope="module")
def bert_hybrid(en_chunks, tmp_path_factory):
    """Bundle over a tiny random-init BERT checkpoint — the bert backend must
    take the SAME one-shot fused path as the hash backend (VERDICT r1 #4)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    ckpt = tmp_path_factory.mktemp("tiny_bert")
    torch.manual_seed(0)
    BertModel(BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=64)).save_pretrained(ckpt)
    vocab = ckpt / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "seller",
         "buyer", "goods", "security", "interest", "of", "a", "delivery"]))
    BertTokenizerFast(vocab_file=str(vocab)).save_pretrained(ckpt)

    from legalrag_tpu.models.bert import FlaxBertEncoder

    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 32
    cfg.engine.late_dim = 16
    cfg.engine.max_query_tokens = 24
    enc = FlaxBertEncoder.from_pretrained(
        str(ckpt), instruction="Represent this question: ",
        max_length=48, token_dim=16)
    bundle = IndexBundle.build_from_chunks(en_chunks[:80], cfg, "en",
                                           encoder=enc)
    return HybridRetriever(bundle, cfg)


def test_bert_backend_takes_one_shot_path(bert_hybrid):
    q = "security interest attaches when value is given"
    one = bert_hybrid._channels_topk_all(q, 16)
    assert one is not None, "bert backend must not fall back to per-channel"
    assert set(one) == {"dense", "bm25", "colbert", "qvec"}
    ds, dr = bert_hybrid.dense.search_rows([q], 16)
    bs, br = bert_hybrid.bm25.search_rows([q], 16)
    ls, lr = bert_hybrid.late.search_rows([q], 16)
    np.testing.assert_allclose(one["dense"][0][0], ds[0], rtol=1e-4, atol=1e-4)
    assert (one["dense"][1][0] == dr[0]).all()
    np.testing.assert_allclose(one["bm25"][0][0], bs[0], rtol=1e-4, atol=1e-4)
    assert (one["bm25"][1][0] == br[0]).all()
    np.testing.assert_allclose(one["colbert"][0][0], ls[0], rtol=1e-3,
                               atol=1e-3)
    assert (one["colbert"][1][0] == lr[0]).all()


def test_bert_backend_full_search(bert_hybrid):
    hits = bert_hybrid.search("the seller must deliver the goods", top_k=5)
    assert hits and hits[0].score_breakdown.get("per_channel")


def test_store_reranker_matches_text_path(hybrid):
    """MaxSimReranker.score_hits (token-store gather, one execution) must
    match the text re-encoding path up to store quantization."""
    from legalrag_tpu.retrieval.rerankers import MaxSimReranker

    q = "security interest attaches when value is given"
    hits = hybrid.search(q, top_k=8)
    rr = MaxSimReranker(hybrid.bundle)
    store = rr.score_hits(q, hits)
    text = rr.score(q, [h.chunk.text for h in hits])
    assert store is not None
    np.testing.assert_allclose(store, text, rtol=0.03, atol=0.05)

    # a hit outside the store falls back to the text path
    from legalrag_tpu.schemas import LawChunk
    fake = RetrievalHit(chunk=LawChunk(id="nope", law_name="x", text="y",
                                       article_no="§ 0-000", article_id="0",
                                       lang="en"), score=0.1)
    assert rr.score_hits(q, hits + [fake]) is None
