"""Single-worker background task queue.

Parity with reference ``TaskQueue`` (``task_queue.py:24-47``): one daemon
worker drains (fn, args, kwargs); exceptions are logged and never kill the
worker. Single-writer-by-construction is the concurrency model for index
mutation (SURVEY.md §5.2).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable

from legalrag_tpu.utils import get_logger

log = get_logger("task_queue")


class TaskQueue:
    def __init__(self, name: str = "ingest"):
        self._q: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name=f"taskqueue-{name}")
        self._worker.start()

    def enqueue(self, fn: Callable, *args: Any, **kwargs: Any) -> None:
        self._q.put((fn, args, kwargs))

    def _run(self) -> None:
        while True:
            fn, args, kwargs = self._q.get()
            try:
                fn(*args, **kwargs)
            except Exception as e:
                log.error("task %s failed: %s", getattr(fn, "__name__", fn), e,
                          exc_info=True)
            finally:
                self._q.task_done()

    def join(self, timeout: float = None) -> bool:
        """Wait for queue drain (tests/ops); True when drained."""
        import time

        deadline = None if timeout is None else time.monotonic() + timeout
        while not self._q.empty() or self._q.unfinished_tasks:
            if deadline is not None and time.monotonic() > deadline:
                return False
            time.sleep(0.02)
        return True
