"""Per-request id propagation (parity: reference ``llm/context.py:3-15``).

The serving layer sets a request id per HTTP request; every LLM log line
reads it from the contextvar, surviving thread hops via ``contextvars.copy``.
"""

from __future__ import annotations

import contextvars
from typing import Optional

_request_id: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "request_id", default=None)


def set_request_id(rid: Optional[str]):
    return _request_id.set(rid)


def get_request_id() -> Optional[str]:
    return _request_id.get()


def reset_request_id(token) -> None:
    _request_id.reset(token)
