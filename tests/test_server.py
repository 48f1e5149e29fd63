"""API server end-to-end through the in-process TestClient."""

import json
import time

import pytest

from legalrag_tpu.api.server import create_app
from legalrag_tpu.api.webcore import TestClient
from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle


@pytest.fixture(scope="module")
def app(en_chunks, zh_chunks, tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.llm.api_key = None
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    cfg.server.prewarm_buckets = 0  # suite speed; covered by its own test
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    for lang, chunks in (("en", en_chunks[:100]), ("zh", zh_chunks[:100])):
        bundle = IndexBundle.build_from_chunks(chunks, cfg.with_lang(lang), lang)
        bundle.save(root / "index_dir" / lang)
    return create_app(cfg, build_async=False)


@pytest.fixture(scope="module")
def client(app):
    return TestClient(app)


def test_health_and_ready(client):
    assert client.get("/health").json() == {"status": "ok"}
    r = client.get("/ready").json()
    assert r["ready"] is True and r["error"] is None


def test_root_lists_endpoints(client):
    j = client.get("/").json()
    assert "/rag/retrieve" in j["endpoints"]


def test_retrieve_and_answer(client):
    r = client.post("/rag/retrieve",
                    json_body={"question": "buyer in ordinary course of business"})
    assert r.status == 200
    body = r.json()
    assert body["retrieval_id"] and body["hits"]
    assert body["decision"]["task_type"]
    top = body["hits"][0]
    assert top["chunk"]["article_id"]
    assert "per_channel" in top["score_breakdown"]

    a = client.post("/rag/answer",
                    json_body={"retrieval_id": body["retrieval_id"]})
    assert a.status == 200
    ans = a.json()
    assert ans["hits"]
    assert "unavailable" in ans["answer"] or "showing" in ans["answer"]


def test_answer_sse_stream(client):
    r = client.post("/rag/retrieve", json_body={"question": "security interest"})
    rid = r.json()["retrieval_id"]
    s = client.post("/rag/answer", json_body={"retrieval_id": rid,
                                              "stream": True})
    events = s.sse_events()
    names = [e for e, _ in events]
    assert names[0] == "meta"
    assert "token" in names
    assert names[-1] == "done"
    meta = events[0][1]
    assert meta["hits"]


def test_query_composed(client):
    r = client.post("/rag/query", json_body={"question": "合同解除的条件"})
    body = r.json()
    assert body["hits"] and body["answer"]
    assert body["hits"][0]["chunk"]["lang"] == "zh"


def test_validation_errors(client):
    assert client.post("/rag/retrieve", json_body={}).status == 422
    assert client.post("/rag/answer",
                       json_body={"retrieval_id": "nope"}).status == 404
    assert client.get("/nope").status == 404
    assert client.get("/rag/retrieve").status == 405


def test_ingest_txt_roundtrip(client, app):
    text = ("Model Widget Act\n"
            "§ 1-101. Definitions. In this act, \"widget\" means a purple "
            "gadget used for testing ingestion pipelines.\n"
            "§ 1-102. Widget Registration. Every widget must be registered "
            "with the widget registry within thirty days.\n")
    boundary = "testboundary42"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="widget_act.txt"\r\n'
            "Content-Type: text/plain\r\n\r\n"
            f"{text}\r\n--{boundary}--\r\n").encode()
    r = client.post("/ingest/pdf", body=body,
                    headers={"content-type":
                             f"multipart/form-data; boundary={boundary}"})
    assert r.status == 200, r.text
    doc_id = r.json()["doc_id"]

    assert app.state.ingest.queue.join(timeout=30)
    status = client.get(f"/ingest/status/{doc_id}").json()["status"]
    assert status["faiss"] == "added" and status["bm25"] == "added"
    assert status["graph"] in ("added", "disabled")

    # the live index picked the new doc up (generation-based reload)
    r2 = client.post("/rag/retrieve",
                     json_body={"question": "purple gadget widget registry"})
    hits = r2.json()["hits"]
    assert any("widget" in h["chunk"]["text"].lower() for h in hits[:3])

    # preview endpoint (fixed vs reference defect §2.13.3)
    p = client.get(f"/debug/ingest/preview?doc_id={doc_id}")
    assert p.status == 200 and p.json()["n_chunks"] >= 1


def test_ingest_rejects_garbage(client):
    r = client.post("/ingest/pdf", body=b"not multipart",
                    headers={"content-type": "text/plain"})
    assert r.status == 422


def test_ui_served(client):
    r = client.get("/ui")
    assert r.status == 200 and "LegalRAG-TPU" in r.text


def test_retrieve_batch(client):
    r = client.post("/rag/retrieve_batch", json_body={
        "questions": ["buyer in ordinary course", "离婚后财产分割"],
        "top_k": 3})
    assert r.status == 200, r.text
    results = r.json()["results"]
    assert len(results) == 2
    assert results[0] and results[0][0]["chunk"]["lang"] == "en"
    assert results[1] and results[1][0]["chunk"]["lang"] == "zh"
    assert all(h["score_breakdown"]["per_channel"] for h in results[0])
    assert client.post("/rag/retrieve_batch", json_body={"questions": []}).status == 422


def test_llm_override_header_degrades_gracefully(client):
    """X-OpenAI-Api-Key forces a keyed openai client; with no egress the
    call fails and the degraded answer must come back (never a 500)."""
    r = client.post("/rag/retrieve", json_body={"question": "lease rent"})
    rid = r.json()["retrieval_id"]
    a = client.post("/rag/answer", json_body={"retrieval_id": rid},
                    headers={"X-OpenAI-Api-Key": "sk-test-override"})
    assert a.status == 200
    assert a.json()["answer"]  # degraded text, not an exception


def test_ingest_statute_path(client, app, zh_chunks):
    """A large statute upload must pass the parse-quality gate and index as
    per-article chunks (not generic ~650-char chunks)."""
    text = "测试统一法\n" + "\n".join(c.text for c in zh_chunks[100:130])
    boundary = "statuteboundary"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="test_statute.txt"\r\n'
            "Content-Type: text/plain\r\n\r\n"
            f"{text}\r\n--{boundary}--\r\n").encode()
    r = client.post("/ingest/pdf", body=body,
                    headers={"content-type":
                             f"multipart/form-data; boundary={boundary}"})
    assert r.status == 200, r.text
    doc_id = r.json()["doc_id"]
    n_chunks = r.json()["chunks"]
    assert n_chunks >= 20  # statute gate min; per-article, not generic
    assert app.state.ingest.queue.join(timeout=30)
    p = client.get(f"/debug/ingest/preview?doc_id={doc_id}").json()
    # statute chunks carry 第X条 article markers
    assert any(c["article_no"].startswith("第") for c in p["chunks"])


def test_sse_structured_events_with_streaming_llm(client, app):
    """A JSON 'sections' answer streaming through /rag/answer must emit
    incremental section/item/sentence events alongside tokens."""
    payload = ('{"sections": [{"title": "结论", "items": ["可以解除。"]}, '
               '{"title": "分析", "items": ["理由一。理由二。"]}]}')

    class StructuredLLM:
        is_degraded = False

        def chat(self, messages, tag="chat", **kw):
            return payload

        def chat_stream(self, messages, tag="chat", **kw):
            for i in range(0, len(payload), 7):
                yield payload[i:i + 7]

        def degraded_answer(self, messages):
            return "degraded"

    old = app.state.pipeline.llm
    app.state.pipeline.llm = StructuredLLM()
    try:
        r = client.post("/rag/retrieve", json_body={"question": "解除合同"})
        rid = r.json()["retrieval_id"]
        s = client.post("/rag/answer", json_body={"retrieval_id": rid,
                                                  "stream": True})
        events = s.sse_events()
        kinds = [e for e, _ in events]
        assert kinds.count("section") == 2
        assert kinds.count("item") == 2
        sentences = [p["sentence"] for e, p in events if e == "sentence"]
        assert "理由一。" in sentences and "理由二。" in sentences
        assert kinds[-1] == "done"
    finally:
        app.state.pipeline.llm = old


def test_metrics_endpoint(client):
    client.post("/rag/retrieve", json_body={"question": "security interest"})
    m = client.get("/metrics")
    assert m.status == 200
    text = m.text
    assert 'legalrag_requests_total{endpoint="retrieve"}' in text
    assert "legalrag_retrieve_seconds_count" in text
    assert "legalrag_retrieve_seconds_bucket" in text


def test_sse_pings_flow_during_llm_stall(client, app):
    """Keep-alive pings must be emitted WHILE the LLM is stalled between
    chunks (not only after one arrives) — proxies drop idle connections
    otherwise (ADVICE r1)."""

    class StallingLLM:
        is_degraded = False

        def chat(self, messages, tag="chat", **kw):
            return "slow answer"

        def chat_stream(self, messages, tag="chat", **kw):
            yield "first"
            time.sleep(2.6)        # > 2 ping intervals
            yield "second"

        def degraded_answer(self, messages):
            return "degraded"

    old = app.state.pipeline.llm
    app.state.pipeline.llm = StallingLLM()
    try:
        r = client.post("/rag/retrieve", json_body={"question": "解除合同"})
        rid = r.json()["retrieval_id"]
        s = client.post("/rag/answer", json_body={"retrieval_id": rid,
                                                  "stream": True})
        raw = s.text
        first = raw.index("first")
        second = raw.index("second")
        assert raw[first:second].count(": ping") >= 2
        assert [e for e, _ in s.sse_events()][-1] == "done"
    finally:
        app.state.pipeline.llm = old


def test_sse_client_disconnect_cleans_up(client, app):
    """Dropping the SSE stream mid-answer (GeneratorExit at a yield) must
    cancel the in-flight LLM iteration and release the worker: the stub's
    stream generator sees close/break instead of pumping forever."""
    import threading as _threading

    state = {"closed": False, "yielded": 0}
    release = _threading.Event()

    class EndlessLLM:
        is_degraded = False

        def chat(self, messages, tag="chat", **kw):
            return "x"

        def chat_stream(self, messages, tag="chat", **kw):
            try:
                while True:
                    state["yielded"] += 1
                    yield "tok "
            finally:
                state["closed"] = True
                release.set()

        def degraded_answer(self, messages):
            return "degraded"

    old = app.state.pipeline.llm
    app.state.pipeline.llm = EndlessLLM()
    try:
        r = client.post("/rag/retrieve", json_body={"question": "解除合同"})
        rid = r.json()["retrieval_id"]
        from legalrag_tpu.api.webcore import Request as WebRequest

        req = WebRequest(method="POST", path="/rag/answer",
                         headers={"content-type": "application/json"},
                         query={}, body=json.dumps(
                             {"retrieval_id": rid, "stream": True}).encode())
        resp = app.dispatch(req)
        it = resp.iterator
        for _ in range(4):          # consume a few SSE chunks...
            next(it)
        it.close()                  # ...then disconnect
        assert release.wait(5.0), "LLM stream generator never closed"
        assert state["closed"]
    finally:
        app.state.pipeline.llm = old


def test_server_bert_backend_end_to_end(en_chunks, tmp_path_factory):
    """embedding_backend=bert through the FULL server path: config-driven
    bundle build, /rag/retrieve (one-shot fused program with the encoder
    forward inside) and /rag/retrieve_batch (FusedQueryEngine cached on
    server state)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    root = tmp_path_factory.mktemp("srv_bert")
    ckpt = root / "tiny_bert"
    torch.manual_seed(0)
    BertModel(BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=64)).save_pretrained(ckpt)
    vocab = ckpt / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "seller",
         "buyer", "goods", "security", "interest", "of", "a", "delivery"]))
    BertTokenizerFast(vocab_file=str(vocab)).save_pretrained(ckpt)

    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.llm.api_key = None
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 32
    cfg.engine.late_dim = 16
    cfg.engine.max_query_tokens = 24
    cfg.retrieval.embedding_backend = "bert"
    cfg.retrieval.embedding_model_en = str(ckpt)
    cfg.retrieval.embedding_model_zh = str(ckpt)
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    bundle = IndexBundle.build_from_chunks(en_chunks[:60],
                                           cfg.with_lang("en"), "en")
    bundle.save(root / "index_dir" / "en")

    client = TestClient(create_app(cfg, build_async=False))
    r = client.post("/rag/retrieve",
                    json_body={"question": "security interest of the buyer",
                               "top_k": 5})
    assert r.status == 200
    hits = r.json()["hits"]
    assert hits and hits[0]["chunk"]["article_id"]

    b = client.post("/rag/retrieve_batch", json_body={
        "questions": ["security interest of the buyer",
                      "delivery of the goods"], "top_k": 5})
    assert b.status == 200
    results = b.json()["results"]
    assert len(results) == 2 and all(res for res in results)
    # single-path and batch-path agree on the top hit
    assert results[0][0]["chunk"]["id"] == hits[0]["chunk"]["id"]


def test_warmup_prewarms_batch_buckets(en_chunks, tmp_path_factory):
    """server.prewarm_buckets: startup warmup must compile the micro-batch
    bucket programs (2..limit) so a first concurrent burst never pays an
    in-request compile (the measured p95 spike, docs/operations.md)."""
    root = tmp_path_factory.mktemp("prewarm")
    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.llm.api_key = None
    cfg.engine.capacity_round = 64
    cfg.engine.late_doc_maxlen = 32
    cfg.server.prewarm_buckets = 4
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    IndexBundle.build_from_chunks(en_chunks[:40], cfg.with_lang("en"),
                                  "en").save(root / "index_dir" / "en")

    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    seen = []
    orig = HybridRetriever._channels_topk_batch

    def spy(self, questions, eff_k):
        seen.append(len(questions))
        return orig(self, questions, eff_k)

    HybridRetriever._channels_topk_batch = spy
    try:
        app = create_app(cfg, build_async=False)
    finally:
        HybridRetriever._channels_topk_batch = orig
    # warmup issued one batch per bucket size 2 and 4 (en only; zh has no
    # index and is skipped gracefully)
    assert [b for b in seen if b > 1] == [2, 4]
    assert app.state.warmup_done
    client = TestClient(app)
    r = client.post("/rag/retrieve",
                    json_body={"question": "delivery of the goods",
                               "top_k": 3})
    assert r.status == 200 and r.json()["hits"]


def test_concurrent_sse_answers_share_batched_engine(client, app):
    """N concurrent /rag/answer SSE streams served by the local-jax
    provider with continuous batching: every stream completes, and the
    batched engine actually multiplexes (occupancy > 1 observed)."""
    import threading

    import jax.numpy as jnp
    import numpy as np

    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient
    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
    from legalrag_tpu.models.decoder import DecoderConfig

    cfg = DecoderConfig(vocab_size=211, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=256)
    rng = np.random.default_rng(17)

    def mat(i, o, scale=0.05):
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

    h, ff, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hkv = cfg.num_key_value_heads
    embed = mat(cfg.vocab_size, h, 0.1)
    params = {
        "embed": embed, "lm_head": embed.T,
        "final_norm": jnp.ones(h, jnp.float32),
        "layers": [
            {"input_norm": jnp.ones(h, jnp.float32),
             "q": {"kernel": mat(h, h), "bias": jnp.zeros(h)},
             "k": {"kernel": mat(h, hkv * d), "bias": jnp.zeros(hkv * d)},
             "v": {"kernel": mat(h, hkv * d), "bias": jnp.zeros(hkv * d)},
             "o": {"kernel": mat(h, h)},
             "post_norm": jnp.ones(h, jnp.float32),
             "gate": {"kernel": mat(h, ff)},
             "up": {"kernel": mat(h, ff)},
             "down": {"kernel": mat(ff, h)}}
            for _ in range(cfg.num_hidden_layers)
        ],
    }

    class FakeTok:
        eos_token_id = None

        def apply_chat_template(self, msgs, tokenize=False,
                                add_generation_prompt=True):
            return " ".join(m["content"] for m in msgs)

        def __call__(self, text, truncation=True, max_length=None):
            return {"input_ids": [ord(c) % 200 + 1 for c in text][:24]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(96 + (i % 26) + 1) for i in ids)

    engine = BatchedDecoderLM(params, cfg, tokenizer=FakeTok(),
                              max_len=128, n_slots=4, decode_chunk=2)
    llm_cfg = LLMConfig(provider="local-jax", temperature=0.0,
                        max_new_tokens=24, max_context_tokens=64)
    llm = LLMClient(llm_cfg)
    llm._local = engine

    old = app.state.pipeline.llm
    app.state.pipeline.llm = llm
    try:
        questions = ["解除合同的条件", "出租人 义务", "security interest",
                     "delivery of goods", "违约责任", "buyer remedies"]
        results = [None] * len(questions)
        occupancy = []

        def run(i):
            r = client.post("/rag/retrieve",
                            json_body={"question": questions[i]})
            rid = r.json()["retrieval_id"]
            s = client.post("/rag/answer", json_body={"retrieval_id": rid,
                                                      "stream": True})
            results[i] = s.sse_events()

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(questions))]
        for t in threads:
            t.start()
        while any(t.is_alive() for t in threads):
            occupancy.append(sum(s is not None for s in engine._slots))
            time.sleep(0.005)
        for t in threads:
            t.join(timeout=60)
        for i, events in enumerate(results):
            assert events is not None, i
            kinds = [e for e, _ in events]
            assert kinds[-1] == "done", (i, kinds[-3:])
            toks = [p.get("text", "") for e, p in events if e == "token"]
            assert len("".join(toks)) >= 5, (i, toks)
        assert max(occupancy) >= 2, occupancy
    finally:
        app.state.pipeline.llm = old
        engine.close()


def test_sse_survives_engine_death_mid_stream(client, app):
    """A decode engine dying mid-generation must degrade the SSE answer
    (client falls back to the retrieval-only text), never hang or 500."""
    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient

    class DyingEngine:
        class tokenizer:  # noqa: N801 - attribute namespace
            eos_token_id = None

            @staticmethod
            def apply_chat_template(m, tokenize=False,
                                    add_generation_prompt=True):
                return " ".join(x["content"] for x in m)

            @staticmethod
            def __call__(text, truncation=True, max_length=None):
                return {"input_ids": [1, 2, 3]}

            @staticmethod
            def decode(ids, skip_special_tokens=True):
                return "x" * len(ids)

        tokenizer = tokenizer()

        def generate_stream(self, ids, **kw):
            yield 5
            yield 6
            raise RuntimeError("accelerator lost mid-decode")

    llm = LLMClient(LLMConfig(provider="local-jax"))
    llm._local = DyingEngine()
    old = app.state.pipeline.llm
    app.state.pipeline.llm = llm
    try:
        r = client.post("/rag/retrieve", json_body={"question": "违约责任"})
        rid = r.json()["retrieval_id"]
        s = client.post("/rag/answer", json_body={"retrieval_id": rid,
                                                  "stream": True})
        events = s.sse_events()
        kinds = [e for e, _ in events]
        assert kinds[-1] == "done"
        text = "".join(p.get("text", "") for e, p in events if e == "token")
        # partial answer + explicit truncation marker (not the full
        # "no model configured" boilerplate after half an answer)
        assert "生成中断" in text or "interrupted" in text
    finally:
        app.state.pipeline.llm = old


def test_citations_event_and_field(client, app):
    """The SSE stream emits a `citations` event (supported vs
    hallucinated refs) before done; the non-stream answer carries the
    same verification field."""
    r = client.post("/rag/retrieve", json_body={"question": "解除合同"})
    body = r.json()
    rid = body["retrieval_id"]
    top_id = body["hits"][0]["chunk"]["article_id"]
    answer = f"依据第{top_id}条，可以解除合同；另见第99999条。"

    class CitingLLM:
        is_degraded = False

        def chat(self, messages, tag="chat", **kw):
            return answer

        def chat_stream(self, messages, tag="chat", **kw):
            for i in range(0, len(answer), 5):
                yield answer[i:i + 5]

        def degraded_answer(self, messages):
            return "degraded"

    old = app.state.pipeline.llm
    app.state.pipeline.llm = CitingLLM()
    try:
        s = client.post("/rag/answer", json_body={"retrieval_id": rid,
                                                  "stream": True})
        events = s.sse_events()
        kinds = [e for e, _ in events]
        assert kinds[-2:] == ["citations", "done"]
        cit = dict(events[kinds.index("citations")][1])
        assert [c["ref"] for c in cit["supported"]] == [top_id]
        assert cit["unsupported"] == ["99999"]

        a = client.post("/rag/answer", json_body={"retrieval_id": rid,
                                                  "stream": False})
        cit2 = a.json()["citations"]
        assert [c["ref"] for c in cit2["supported"]] == [top_id]
        assert cit2["unsupported"] == ["99999"]
    finally:
        app.state.pipeline.llm = old


def test_graceful_drain(en_chunks, zh_chunks, tmp_path_factory):
    """shutdown_gracefully: /ready flips to 503 (draining=true) so load
    balancers stop routing, the listener stops accepting afterwards, and
    the LLM engine's close() is invoked. Over a real socket."""
    import threading
    import urllib.error
    import urllib.request

    from legalrag_tpu.api.server import shutdown_gracefully

    root = tmp_path_factory.mktemp("drain")
    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.llm.api_key = None
    cfg.engine.capacity_round = 256
    cfg.server.prewarm_buckets = 0
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    for lang, chunks in (("en", en_chunks[:50]), ("zh", zh_chunks[:50])):
        bundle = IndexBundle.build_from_chunks(chunks, cfg.with_lang(lang),
                                               lang)
        bundle.save(root / "index_dir" / lang)
    app = create_app(cfg, build_async=False)
    server = app.serve("127.0.0.1", 0)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    closed = []
    app.state.pipeline.llm.close = lambda: closed.append(True)

    def get_status(path):
        try:
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    assert get_status("/ready") == 200
    flipped = []

    def probe_during_grace():
        time.sleep(0.15)  # inside the 0.6 s grace window
        flipped.append(get_status("/ready"))

    th = threading.Thread(target=probe_during_grace)
    th.start()
    shutdown_gracefully(app.state, server, grace=0.6)
    th.join(timeout=10)
    assert flipped == [503]          # still serving, but drained from LB
    assert closed == [True]          # engine released
    with pytest.raises(Exception):   # listener is gone
        urllib.request.urlopen(base + "/health", timeout=3)
