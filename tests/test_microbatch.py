"""Micro-batcher: concurrent searches coalesce into fewer device executions
with results identical to the serial path (retrieval/batcher.py)."""

import threading
import time

import numpy as np
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.retrieval.batcher import MicroBatcher, _slice_result
from legalrag_tpu.retrieval.hybrid import HybridRetriever


@pytest.fixture(scope="module")
def hybrid(en_chunks):
    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    cfg.engine.microbatch_window_ms = 20.0  # generous window: force overlap
    bundle = IndexBundle.build_from_chunks(en_chunks[:120], cfg, "en")
    return HybridRetriever(bundle, cfg)


QUESTIONS = [
    "buyer in ordinary course of business",
    "negotiable instrument payable to bearer",
    "security interest perfection filing",
    "letter of credit issuer obligations",
    "lease contract default remedies",
    "warranty of merchantability goods",
]


def test_concurrent_searches_match_serial_and_coalesce(hybrid):
    serial = {q: hybrid.search(q, top_k=5) for q in QUESTIONS}
    base_exec = hybrid._batcher.executions

    results = {}
    errors = []

    def worker(q):
        try:
            results[q] = hybrid.search(q, top_k=5)
        except Exception as e:  # surfaces in the main thread
            errors.append(e)

    # barrier-released threads so arrivals overlap the leader's window
    threads = [threading.Thread(target=worker, args=(q,)) for q in QUESTIONS]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors

    for q in QUESTIONS:
        got, want = results[q], serial[q]
        assert [h.chunk.id for h in got] == [h.chunk.id for h in want]
        # matmul reduction tiling differs across batch shapes, so scores
        # agree to float tolerance, not bitwise
        assert np.allclose([h.score for h in got], [h.score for h in want],
                           atol=1e-4)

    used = hybrid._batcher.executions - base_exec
    assert used < len(QUESTIONS), (
        f"no coalescing happened ({used} executions for {len(QUESTIONS)} "
        "concurrent queries)")
    assert hybrid._batcher.coalesced > 0


def test_mixed_eff_k_slices_nest(hybrid):
    # a small-k request served from a larger batched execution must see
    # exactly the prefix of its own solo top-k list
    solo = hybrid._channels_topk_batch(["security interest filing"], 8)

    def run_both():
        out = {}

        def small():
            out["small"] = hybrid._batcher.run("security interest filing", 8)

        def big():
            out["big"] = hybrid._batcher.run("lease default remedies", 32)

        ts = [threading.Thread(target=small), threading.Thread(target=big)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return out

    out = run_both()
    for name in ("dense", "bm25"):
        np.testing.assert_array_equal(out["small"][name][1],
                                      solo[name][1])
        assert out["small"][name][0].shape[1] == 8
        assert out["big"][name][0].shape[1] == 32


def test_batcher_error_propagates_to_all_waiters():
    calls = {"n": 0}

    def boom(questions, eff_k):
        calls["n"] += 1
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, window_s=0.02, max_batch=8)
    errs = []

    def worker():
        try:
            mb.run("q", 4)
        except RuntimeError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=worker) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == ["device on fire"] * 3


def test_slice_result_none_passthrough():
    assert _slice_result(None, 0, 4) is None


def test_empty_index_returns_none(en_chunks):
    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    bundle = IndexBundle.build_from_chunks(en_chunks[:10], cfg, "en")
    hybrid = HybridRetriever(bundle, cfg)
    bundle.dense.n = 0  # simulate an empty index
    assert hybrid._channels_topk_all("anything", 8) is None


def test_leader_returns_while_queue_still_draining():
    """Regression (ADVICE r2): the leader's request thread used to keep
    draining the queue until it was empty — under sustained load its own
    HTTP response (computed in the FIRST batch) was delayed unboundedly.
    After the first batch, draining must move to a daemon thread."""
    calls = {"n": 0}
    block = threading.Event()

    def run(questions, eff_k):
        calls["n"] += 1
        if calls["n"] > 1:  # every batch after the leader's blocks
            block.wait(5.0)
        return {"x": (np.zeros((len(questions), eff_k), np.float32),
                      np.zeros((len(questions), eff_k), np.int32))}

    mb = MicroBatcher(run, window_s=0.1, max_batch=1)
    done = {}

    def worker(name):
        done[name] = mb.run(name, 4)

    leader = threading.Thread(target=worker, args=("leader",))
    leader.start()
    time.sleep(0.02)  # leader is inside its batching window
    followers = [threading.Thread(target=worker, args=(f"f{i}",))
                 for i in range(2)]
    for t in followers:
        t.start()
    leader.join(3.0)
    alive = leader.is_alive()
    block.set()  # always unblock before asserting, or threads leak
    for t in followers:
        t.join(5.0)
    assert not alive, "leader starved behind follower batches"
    assert len(done) == 3 and all(v is not None for v in done.values())


def test_slow_execution_does_not_trigger_duplicate_solo_runs():
    """Regression: followers whose slot was already drained into an
    in-flight batch used to time out (wait_timeout) and launch their own
    solo executions — exactly during first-compile storms when the device
    is slowest. A claimed slot must wait for the leader's result."""
    calls = []
    release = threading.Event()

    def slow_run(questions, eff_k):
        calls.append(list(questions))
        release.wait(5.0)  # longer than the batcher timeout below
        return {"x": (np.zeros((len(questions), eff_k), np.float32),
                      np.zeros((len(questions), eff_k), np.int32))}

    mb = MicroBatcher(slow_run, window_s=0.05, max_batch=8,
                      wait_timeout_s=0.2)
    out, errs = [], []

    def worker(q):
        try:
            out.append(mb.run(q, 4))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(f"q{i}",)) for i in range(4)]
    for t in ts:
        t.start()
    time.sleep(1.0)          # all four slots claimed, execution in flight
    release.set()
    for t in ts:
        t.join()
    assert not errs
    assert len(out) == 4 and all(o is not None for o in out)
    assert len(calls) == 1   # ONE device execution, no solo duplicates
    assert sorted(calls[0]) == ["q0", "q1", "q2", "q3"]
