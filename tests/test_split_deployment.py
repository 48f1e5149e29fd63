"""Split deployment: api process delegating to the retrieval microservice
over HTTP (docker-compose topology, in-process via RETRIEVAL_URL)."""

import json
import os

import pytest

from legalrag_tpu.api.retrieval_api import create_app as create_retrieval_app
from legalrag_tpu.api.server import create_app as create_main_app
from legalrag_tpu.api.webcore import TestClient
from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle


@pytest.fixture(scope="module")
def split(en_chunks, zh_chunks, tmp_path_factory):
    root = tmp_path_factory.mktemp("split")
    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.llm.api_key = None
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    cfg.server.prewarm_buckets = 0  # suite speed
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    for lang, chunks in (("en", en_chunks[:80]), ("zh", zh_chunks[:80])):
        IndexBundle.build_from_chunks(chunks, cfg.with_lang(lang),
                                      lang).save(root / "index_dir" / lang)

    # retrieval microservice over a REAL socket
    retrieval_app = create_retrieval_app(cfg)
    server = retrieval_app.serve("127.0.0.1", 0)
    url = f"http://127.0.0.1:{server.server_address[1]}"

    os.environ["RETRIEVAL_URL"] = url
    try:
        main_app = create_main_app(cfg, build_async=False)
    finally:
        del os.environ["RETRIEVAL_URL"]
    yield TestClient(main_app), url
    server.shutdown()


def test_api_delegates_retrieval(split):
    client, url = split
    r = client.post("/rag/retrieve",
                    json_body={"question": "buyer in ordinary course"})
    assert r.status == 200, r.text
    body = r.json()
    assert body["hits"]
    assert body["decision"]["task_type"]
    assert body["hits"][0]["chunk"]["lang"] == "en"
    # the answer stage consumes the remotely-retrieved hits
    a = client.post("/rag/answer", json_body={"retrieval_id":
                                              body["retrieval_id"]})
    assert a.status == 200 and a.json()["hits"]


def test_retrieval_service_direct(split):
    _client, url = split
    import urllib.request

    req = urllib.request.Request(
        url + "/retrieve",
        data=json.dumps({"question": "离婚后的财产"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        obj = json.loads(resp.read())
    assert obj["hits"] and obj["hits"][0]["chunk"]["lang"] == "zh"
