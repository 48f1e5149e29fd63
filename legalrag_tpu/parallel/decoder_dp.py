"""Data-parallel decode serving — engine replicas over the device set.

Tensor parallelism (``decoder_tp``) scales a single generation stream's
latency; DP scales aggregate serving throughput: ``R`` independent
engine replicas, each pinned to its own device (or its own ``tp``-wide
submesh), sit behind one ``generate_stream`` front with least-busy
admission. Replication is pure placement — each replica holds its own
copy of the params and its own slot cache, there is no cross-replica
communication at all (the ideal collective is the one you don't run),
so aggregate tokens/s scales linearly with replicas until the host
thread saturates. Replaces the reference's scale-out story of running
more docker HTTP replicas behind a load balancer
(reference ``docker-compose.yml:1-23``) with in-process device-level
replication: one server process, one admission queue, R chips.

Composes with everything the engines support: continuous batching,
speculation, prefix caches, shared prefixes, quantization — the router
is engine-agnostic and only routes. With ``tp_shards > 1`` each replica
spans a ``1×tp`` submesh (DP×TP over ``R·tp`` devices), mirroring the
retrieval engine's ``n_index_shards`` mesh serving.
"""

from __future__ import annotations

import threading
from typing import Iterator, List, Optional, Sequence

import jax

from legalrag_tpu.utils import get_logger

log = get_logger("parallel.decoder_dp")


class DPDecoderRouter:
    """Least-busy router over decode-engine replicas.

    Presents the single-engine surface the client uses
    (``generate_stream`` / ``tokenizer`` / ``close``); any number of
    threads may stream concurrently, each stream runs wholly on one
    replica (token streams are stateful — there is nothing to migrate
    mid-generation, and slot-level batching happens inside the replica).
    """

    def __init__(self, engines: Sequence):
        if not engines:
            raise ValueError("DPDecoderRouter needs at least one engine")
        self.engines = list(engines)
        self._active = [0] * len(self.engines)
        self._lock = threading.Lock()
        self.tokenizer = getattr(self.engines[0], "tokenizer", None)

    # ------------------------------------------------------------ admission
    def _acquire(self) -> int:
        with self._lock:
            i = min(range(len(self.engines)), key=lambda j: self._active[j])
            self._active[i] += 1
            return i

    def _release(self, i: int) -> None:
        with self._lock:
            self._active[i] -= 1

    @property
    def active_per_replica(self) -> List[int]:
        with self._lock:
            return list(self._active)

    # ------------------------------------------------------------- surface
    def generate_stream(self, prompt_ids: List[int], **kw) -> Iterator[int]:
        """Stream tokens from the least-busy replica (same contract as the
        wrapped engine's ``generate_stream``)."""
        i = self._acquire()
        try:
            yield from self.engines[i].generate_stream(prompt_ids, **kw)
        finally:
            self._release(i)

    def close(self) -> None:
        for eng in self.engines:
            close = getattr(eng, "close", None)
            if close is not None:
                close()

    # --------------------------------------------------------- construction
    @classmethod
    def from_pretrained(cls, engine_cls, name_or_path: str, replicas: int,
                        tp_shards: int = 0,
                        devices: Optional[Sequence[jax.Device]] = None,
                        **kw) -> "DPDecoderRouter":
        """Build ``replicas`` engines of ``engine_cls``, one per device —
        or, with ``tp_shards > 1``, one per ``tp``-wide submesh (DP×TP
        over ``replicas·tp`` devices)."""
        from legalrag_tpu.parallel.mesh import local_devices

        tp = max(tp_shards, 1)
        devs = list(devices) if devices is not None else local_devices()
        need = replicas * tp
        if len(devs) < need:
            raise ValueError(
                f"dp_replicas={replicas} × tp_shards={tp} needs {need} "
                f"devices, have {len(devs)}")
        engines = []
        for r in range(replicas):
            sub = devs[r * tp:(r + 1) * tp]
            eng = engine_cls.from_pretrained(
                name_or_path, device=None if tp > 1 else sub[0], **kw)
            if tp > 1:
                from legalrag_tpu.parallel.decoder_tp import \
                    apply_tp_to_engine
                from legalrag_tpu.parallel.mesh import make_mesh

                apply_tp_to_engine(eng, make_mesh(sub, data=1, model=tp))
            engines.append(eng)
        log.info("DP decode router: %d replicas × %d-way TP over %s",
                 replicas, tp, [str(d) for d in devs[:need]])
        return cls(engines)
