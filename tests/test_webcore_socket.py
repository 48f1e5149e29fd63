"""webcore over a real socket: routing, JSON, chunked SSE streaming, CORS."""

import json
import time
import urllib.request

import pytest

from legalrag_tpu.api.webcore import App, Request, Response, StreamingResponse, sse_event


@pytest.fixture(scope="module")
def server_url():
    app = App()

    @app.get("/ping")
    def ping(req: Request) -> Response:
        return Response({"pong": True, "q": req.query.get("x")})

    @app.post("/echo/{name}")
    def echo(req: Request) -> Response:
        return Response({"name": req.params["name"], "body": req.json()})

    @app.post("/stream")
    def stream(req: Request) -> StreamingResponse:
        def gen():
            for i in range(3):
                yield sse_event("tick", {"i": i})
            yield sse_event("done", {})
        return StreamingResponse(gen())

    server = app.serve("127.0.0.1", 0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read().decode()


def test_get_with_query(server_url):
    status, body = _get(server_url + "/ping?x=42")
    assert status == 200
    assert json.loads(body) == {"pong": True, "q": "42"}


def test_post_path_params_json(server_url):
    req = urllib.request.Request(
        server_url + "/echo/alice", data=json.dumps({"k": 1}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
        obj = json.loads(r.read())
    assert obj == {"name": "alice", "body": {"k": 1}}


def test_sse_chunked_stream(server_url):
    req = urllib.request.Request(server_url + "/stream", data=b"{}",
                                 headers={"Content-Type": "application/json"},
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        text = r.read().decode()
    events = [l.split(": ", 1)[1] for l in text.splitlines()
              if l.startswith("event: ")]
    assert events == ["tick", "tick", "tick", "done"]


def test_404_and_405(server_url):
    try:
        _get(server_url + "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
    try:
        _get(server_url + "/stream")  # GET on POST route
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 405


def test_malformed_json_is_400(server_url):
    req = urllib.request.Request(server_url + "/echo/bob", data=b"not json",
                                 headers={"Content-Type": "application/json"},
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "invalid JSON" in e.read().decode()
