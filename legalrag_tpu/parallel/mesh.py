"""Device discovery and mesh construction.

The engine scales over a 2-D ``(data, model)`` mesh: query batches shard over
``data`` (DP), corpus rows shard over ``model`` (the TP analogue for an
index — each chip owns a slice of the document axis and merges partial
top-k over ICI). This replaces the reference's HTTP-microservice scale-out
(SURVEY.md §2.11).

``local_devices`` honors ``LEGALRAG_FORCE_CPU`` because the axon TPU plugin
in the build image force-registers itself even when ``JAX_PLATFORMS=cpu``.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_devices(platform: Optional[str] = None) -> List[jax.Device]:
    if platform is None and os.environ.get("LEGALRAG_FORCE_CPU"):
        platform = "cpu"
    if platform is not None:
        return list(jax.devices(platform))
    return list(jax.devices())


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: Optional[int] = None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    Defaults: all local devices on the ``model`` (corpus) axis — corpus
    sharding is the capacity axis; DP is added when the query stream needs it.
    """
    devs = list(devices) if devices is not None else local_devices()
    n = len(devs)
    if data is None and model is None:
        data, model = 1, n
    elif data is None:
        data = n // model  # type: ignore[operator]
    elif model is None:
        model = n // data
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def init_multihost() -> bool:
    """Initialize ``jax.distributed`` from the standard coordinator env
    (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` where the platform can't infer them]). No-op —
    returns False — when the env is absent or it is already initialized,
    so single-host flows never pay anything. After this,
    ``jax.devices()`` is GLOBAL across hosts and the serving mesh can
    span a full pod slice.

    Call this at PROCESS ENTRY (the server CLI does), before anything
    touches a backend — jax refuses to initialize the distributed client
    after backend init, and a late call would silently leave
    ``jax.devices()`` process-local."""
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return False
    # jax.distributed.initialize() only auto-detects process count/id under
    # a recognized cluster scheduler (SLURM & co.); on bare hosts the
    # standard env carries them — pass explicitly (verified by the real
    # 2-process test, tests/test_multihost.py)
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Either already initialized (fine) or called too late / the
        # coordinator is unreachable — say so instead of silently serving
        # a single-host mesh under a multi-host config.
        import logging

        logging.getLogger("parallel.mesh").warning(
            "jax.distributed.initialize failed (%s); continuing with "
            "process-local devices", e)
        return False
    return True


def slice_major_order(devices: Sequence) -> tuple:
    """Order devices (slice, process, id)-major and return
    ``(n_slices, ordered)``.

    Layout policy for the index engine (the scaling-book recipe): chips
    WITHIN a pod slice are ICI-connected — the corpus (``model``) axis
    lives there, so the per-query all_gather top-k merges ride ICI.
    Separate slices only reach each other over DCN — that boundary gets
    the ``data`` (query-batch) axis, whose only collective is the batch
    scatter/gather. Pure function (testable with stub devices)."""
    order = sorted(devices, key=lambda d: (getattr(d, "slice_index", 0) or 0,
                                           d.process_index, d.id))
    n_slices = len({getattr(d, "slice_index", 0) or 0 for d in order})
    return n_slices, order


def make_global_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """``(data, model)`` mesh over ALL visible devices: ``data`` = pod
    slices (DCN), ``model`` = chips within a slice (ICI). Single-slice
    (including single-host) degenerates to ``(1, n)`` — identical to the
    default ``make_mesh``. Call ``init_multihost()`` first so
    ``jax.devices()`` is global."""
    devs = list(devices) if devices is not None else local_devices()
    n_slices, order = slice_major_order(devs)
    assert len(order) % n_slices == 0, \
        f"{len(order)} devices do not tile {n_slices} slices"
    arr = np.asarray(order).reshape(n_slices, len(order) // n_slices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (corpus rows) over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (query batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
