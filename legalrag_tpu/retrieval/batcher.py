"""Dynamic micro-batching for concurrent single-query channel searches.

The serving substrate is a threaded HTTP server (``api/webcore.py``): each
``/rag/retrieve`` request runs ``HybridRetriever.search`` on its own thread,
and each search costs one device execution (~one tunnel round trip on remote
TPU backends, CLAUDE.md). Under concurrent load, N requests would cost N
round trips even though the fused channels program is fully batched over
queries (``ops/fused_query.py:283``).

``MicroBatcher`` coalesces those concurrent executions: the first arriving
thread becomes the *leader*, waits one small window for followers, then runs
the batched program ONCE for every pending question and distributes row
slices. Requests arriving while the leader is executing are picked up in its
next drain round, so the device execution time itself acts as a natural
batching window. The reference has no analogue (its FastAPI workers each run
the full CPU stack per request); this is the TPU-native replacement for
"scale out by adding HTTP replicas" (reference docker-compose.yml:1-23).

Semantics are unchanged: the channels program is row-independent (pure
matmul + top-k per query row), so a coalesced execution returns the same
rankings as solo executions; scores agree to float tolerance (XLA may tile
the matmul reduction differently across batch shapes). Tested in
tests/test_microbatch.py.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# res dict: {"dense"|"bm25"|"colbert": (scores [B,k], rows [B,k]),
#            "qvec": [B,d]} — see HybridRetriever._channels_topk_batch
Result = Optional[Dict[str, object]]
RunBatch = Callable[[Sequence[str], int], Result]


class _Slot:
    __slots__ = ("question", "eff_k", "event", "value", "error", "done",
                 "t_enqueue")

    def __init__(self, question: str, eff_k: int):
        self.question = question
        self.eff_k = eff_k
        self.event = threading.Event()
        self.value: Result = None
        self.error: Optional[BaseException] = None
        self.done = False
        self.t_enqueue = time.perf_counter()


def _slice_result(res: Result, i: int, eff_k: int) -> Result:
    """One question's view of a batched result, keeping the leading batch
    dim of 1 so downstream ``[0]`` indexing is unchanged."""
    if res is None:
        return None
    out: Dict[str, object] = {}
    for name, val in res.items():
        if name == "qvec":
            out[name] = np.asarray(val)[i:i + 1]
        else:
            s, rows = val
            out[name] = (np.asarray(s)[i:i + 1, :eff_k],
                         np.asarray(rows)[i:i + 1, :eff_k])
    return out


class MicroBatcher:
    """Leader/follower coalescing of concurrent ``run_batch`` calls.

    ``run_batch(questions, eff_k)`` must be row-independent over questions.
    Mixed ``eff_k`` values are served from one execution at the batch max
    (each request slices its own prefix — top-k lists nest).
    """

    def __init__(self, run_batch: RunBatch, window_s: float = 0.002,
                 max_batch: int = 32, wait_timeout_s: float = 300.0):
        self._run = run_batch
        self._window = max(float(window_s), 0.0)
        self._max = max(int(max_batch), 1)
        self._timeout = wait_timeout_s
        self._lock = threading.Lock()
        self._pending: List[_Slot] = []
        self._leader_active = False
        # observability (read by tests and /metrics)
        self.executions = 0
        self.coalesced = 0

    # ------------------------------------------------------------- public
    def run(self, question: str, eff_k: int) -> Result:
        slot = _Slot(question, eff_k)
        with self._lock:
            self._pending.append(slot)
            lead = not self._leader_active
            if lead:
                self._leader_active = True
        if lead:
            self._lead()
            # the leader's own slot is always in its first drained batch
            # (it was appended before leadership was taken)
        ok = slot.event.wait(self._timeout)
        if not ok:
            with self._lock:
                unclaimed = slot in self._pending
                if unclaimed:
                    self._pending.remove(slot)
            if unclaimed:
                # leader vanished before draining us (should not happen —
                # _lead never abandons a non-empty queue): solo execution
                res = self._run([question], eff_k)
                return _slice_result(res, 0, eff_k)
            # Our slot is inside an in-flight execution (first-compile
            # storms routinely exceed the timeout on remote-compile
            # backends): the leader WILL complete it (errors propagate
            # too) — a duplicate solo run would pile more device work on
            # the slowest moment. Wait it out.
            slot.event.wait()
        if slot.error is not None:
            raise slot.error
        return slot.value

    # ------------------------------------------------------------ leader
    def _lead(self) -> None:
        if self._window > 0:
            threading.Event().wait(self._window)  # interrupt-safe sleep
        with self._lock:
            batch = self._pending[: self._max]
            del self._pending[: len(batch)]
            if not batch:
                self._leader_active = False
                return
        self._execute(batch)
        # The leader's own slot was in that batch (it is always pending[0]
        # when leadership is taken), so this request thread must not be
        # held past its own completion: under sustained load the queue
        # never empties and the leader's HTTP client would time out while
        # followers are served. Hand the remaining queue to a daemon
        # drainer instead of looping here.
        with self._lock:
            if not self._pending:
                self._leader_active = False
                return
        try:
            threading.Thread(target=self._drain, daemon=True,
                             name="microbatch-drain").start()
        except BaseException:
            # thread spawn can fail under OS thread exhaustion; a phantom
            # leader flag would make every future request wait out the
            # full timeout and solo-run — reset so a follower can lead
            with self._lock:
                self._leader_active = False
            raise

    def _drain(self) -> None:
        while True:
            with self._lock:
                batch = self._pending[: self._max]
                del self._pending[: len(batch)]
                if not batch:
                    self._leader_active = False
                    return
            self._execute(batch)

    def _execute(self, batch: List[_Slot]) -> None:
        eff_k = max(s.eff_k for s in batch)
        t_start = time.perf_counter()
        with self._lock:
            depth = len(self._pending)
        try:
            res = self._run([s.question for s in batch], eff_k)
        except BaseException as e:  # propagate to every waiter
            for s in batch:
                s.error, s.done = e, True
                s.event.set()
            return
        self.executions += 1
        self.coalesced += len(batch) - 1
        try:
            from legalrag_tpu.utils.metrics import METRICS

            METRICS.inc("legalrag_microbatch_executions")
            if len(batch) > 1:
                METRICS.inc("legalrag_microbatch_coalesced",
                            value=len(batch) - 1)
            # p95-chase instrumentation (VERDICT r2 #8): where does a slow
            # request's time go — queueing before its batch started
            # (wait), the device execution itself (exec), or a deep queue
            # at execution time (depth)?
            METRICS.observe("legalrag_microbatch_exec_seconds",
                            time.perf_counter() - t_start)
            for s in batch:
                METRICS.observe("legalrag_microbatch_wait_seconds",
                                t_start - s.t_enqueue)
            METRICS.inc("legalrag_microbatch_batched_requests",
                        value=len(batch))
            METRICS.inc("legalrag_microbatch_queue_depth_sum", value=depth)
        except Exception:
            pass
        for i, s in enumerate(batch):
            s.value = _slice_result(res, i, s.eff_k)
            s.done = True
            s.event.set()
