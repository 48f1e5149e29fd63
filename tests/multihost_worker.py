"""Worker for the REAL 2-process DCN test (VERDICT r2 #3).

Launched by ``tests/test_multihost.py`` as two OS processes with the
standard coordinator env (``JAX_COORDINATOR_ADDRESS`` etc.). Each process
exercises the production multi-host entry points — ``init_multihost()``
(real ``jax.distributed.initialize``, not fakes), ``make_global_mesh()``
over the now-global device set, ``sharded_channels_topk`` over it — and
process 0 prints the gathered candidate lists as JSON for the parent to
compare against a single-process oracle. This executes the code path that
replaces the reference's docker-compose scale-out
(``/root/reference/docker-compose.yml:1-23``).

Run standalone (either role):
  JAX_COORDINATOR_ADDRESS=127.0.0.1:9911 JAX_NUM_PROCESSES=2 \
  JAX_PROCESS_ID=0 python tests/multihost_worker.py
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# CPU cross-process collectives need gloo; set before backend init. The
# axon TPU plugin force-registers and owns the DEFAULT backend even under
# JAX_PLATFORMS=cpu (CLAUDE.md gotcha), so everything below pins the cpu
# platform explicitly (LEGALRAG_FORCE_CPU routes local_devices to it).
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
os.environ["LEGALRAG_FORCE_CPU"] = "1"


def main() -> None:
    import jax

    from legalrag_tpu.parallel.mesh import init_multihost, make_global_mesh

    ok = init_multihost()
    assert ok, "init_multihost must take the real initialize path here"
    from legalrag_tpu.utils.device import apply_force_cpu

    apply_force_cpu()  # default device → cpu (axon owns the default)
    n_proc = jax.process_count("cpu")
    assert n_proc == int(os.environ["JAX_NUM_PROCESSES"]), (
        n_proc, os.environ["JAX_NUM_PROCESSES"])

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from legalrag_tpu.parallel.mesh import MODEL_AXIS
    from legalrag_tpu.parallel.sharded_search import sharded_channels_topk

    mesh = make_global_mesh()
    n_dev = len(jax.devices("cpu"))

    # identical deterministic corpus in every process
    rng = np.random.default_rng(7)
    n, d, v, b, eff_k = 16 * n_dev, 32, 64, 4, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    impact = np.abs(rng.standard_normal((v, n))).astype(np.float32)
    qvec = rng.standard_normal((b, d)).astype(np.float32)
    qvec /= np.linalg.norm(qvec, axis=1, keepdims=True)
    term_ids = rng.integers(0, v, (b, 6)).astype(np.int32)
    term_mask = np.ones((b, 6), np.float32)

    # model axis spans BOTH processes: device_put distributes each
    # process's addressable shards from the full logical array
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P(MODEL_AXIS, None)))
    imp_sh = jax.device_put(impact, NamedSharding(mesh, P(None, MODEL_AXIS)))
    # query-side inputs stay HOST numpy: a committed process-local jax.Array
    # cannot be resharded onto a non-fully-addressable mesh; identical host
    # values on every process are auto-replicated by jit
    out = sharded_channels_topk(
        mesh, eff_k, emb_sh, imp_sh, None, None, qvec,
        (term_ids, term_mask), None, None, np.int32(n - 3))

    # outputs are replicated (P() out-specs): every process can read them
    res = {
        "n_processes": n_proc,
        "n_devices": n_dev,
        "mesh_model": mesh.shape[MODEL_AXIS],
        "dense_s": np.asarray(out["dense"][0]).tolist(),
        "dense_i": np.asarray(out["dense"][1]).tolist(),
        "bm25_s": np.asarray(out["bm25"][0]).tolist(),
        "bm25_i": np.asarray(out["bm25"][1]).tolist(),
    }
    if jax.process_index("cpu") == 0:
        print("RESULT " + json.dumps(res), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
