"""Device-scoping helper.

Index structures carry an optional pinned device (CPU for offline builds,
TPU for serving). Eager jnp ops follow JAX's *default* device, so every
mutating method scopes itself with this context manager — otherwise a
CPU-pinned build still triggers accelerator compiles (observed: ~40s per
unique shape on remote-compile TPU backends).
"""

from __future__ import annotations

import contextlib

import jax


def on_device(device):
    """``with on_device(dev):`` — no-op when dev is None."""
    if device is None:
        return contextlib.nullcontext()
    return jax.default_device(device)


def apply_force_cpu() -> None:
    """Honor ``LEGALRAG_FORCE_CPU=1``: pin the default device to CPU. Used
    by CLIs so offline work never pays accelerator remote-compile latency
    (the axon plugin wins the default-backend race even under
    ``JAX_PLATFORMS=cpu``)."""
    import os

    if os.environ.get("LEGALRAG_FORCE_CPU"):
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
