"""Persistent XLA compilation cache.

Remote-compile TPU backends pay tens of seconds to minutes per program;
the persistent cache makes warmup a one-time cost across processes and
restarts. Called by every entry point (server, bench, CLIs) before the
first jit.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = Path(path or os.environ.get(
        "LEGALRAG_COMPILE_CACHE",
        Path.home() / ".cache" / "legalrag_tpu" / "xla_cache"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True
    except Exception:
        pass
