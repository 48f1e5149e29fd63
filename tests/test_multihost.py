"""REAL 2-process DCN execution test (VERDICT r2 #3).

Spawns two OS processes that each run ``jax.distributed.initialize`` via the
production ``init_multihost()`` entry point (coordinator on localhost, CPU
platform, gloo collectives), build the slice-major global mesh over the
4 global devices (2 per process — the ``model`` axis spans the process
boundary, so the all_gather candidate merge rides the cross-process
transport), execute ``sharded_channels_topk``, and print the gathered
candidate lists. The parent asserts exact agreement with a SINGLE-process
run of the identical mesh geometry (same shard shapes → same reduction
orders → identical floats).

This executes the code path that replaces the reference's docker-compose
HTTP scale-out (``/root/reference/docker-compose.yml:1-23``) — previously
only unit-tested with fake device objects.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(port: int, n_proc: int, pid: int, devs_per_proc: int):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    env.update({
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": str(n_proc),
        "JAX_PROCESS_ID": str(pid),
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devs_per_proc}",
    })
    return env


def _run_workers(n_proc: int, devs_per_proc: int, timeout=300):
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, str(WORKER)],
                         cwd=REPO, env=_env(port, n_proc, pid, devs_per_proc),
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{err[-3000:]}"
    result_lines = [ln for rc, out, _ in outs for ln in out.splitlines()
                    if ln.startswith("RESULT ")]
    assert len(result_lines) == 1, outs
    return json.loads(result_lines[0][len("RESULT "):])


def test_two_process_dcn_matches_single_process():
    two = _run_workers(n_proc=2, devs_per_proc=2)
    one = _run_workers(n_proc=1, devs_per_proc=4)

    assert two["n_processes"] == 2 and one["n_processes"] == 1
    assert two["n_devices"] == one["n_devices"] == 4
    assert two["mesh_model"] == one["mesh_model"] == 4

    # identical mesh geometry → identical shard-local programs → the
    # merged candidate lists must agree exactly (ids) / to f32 (scores)
    np.testing.assert_array_equal(np.asarray(two["dense_i"]),
                                  np.asarray(one["dense_i"]))
    np.testing.assert_array_equal(np.asarray(two["bm25_i"]),
                                  np.asarray(one["bm25_i"]))
    np.testing.assert_allclose(np.asarray(two["dense_s"]),
                               np.asarray(one["dense_s"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(two["bm25_s"]),
                               np.asarray(one["bm25_s"]), atol=1e-6)

    # and against a pure-NumPy oracle of the same corpus (seed 7 mirrors
    # the worker): the gathered lists are the true global top-k
    rng = np.random.default_rng(7)
    n, d, v, b = 16 * 4, 32, 64, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    impact = np.abs(rng.standard_normal((v, n))).astype(np.float32)
    qvec = rng.standard_normal((b, d)).astype(np.float32)
    qvec /= np.linalg.norm(qvec, axis=1, keepdims=True)
    scores = qvec @ emb.T
    scores[:, n - 3:] = -np.inf
    oracle_ids = np.argsort(-scores, axis=1, kind="stable")[:, :8]
    got = np.asarray(two["dense_i"])
    for row in range(b):
        assert set(got[row]) == set(oracle_ids[row].tolist())
