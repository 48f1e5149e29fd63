"""Serving load benchmark: concurrent HTTP /rag/retrieve throughput.

Quantifies the dynamic micro-batcher (``retrieval/batcher.py``): the same
real-socket server is loaded with K concurrent clients, once with
coalescing disabled (``microbatch_max=1`` — every request is its own device
execution, the round-1 behavior) and once enabled. The reference's answer
to concurrency is process replication behind docker-compose
(reference docker-compose.yml:1-23); here one process shares one chip
across requests.

Usage: python -m scripts.bench_serving [--clients 16] [--requests 8]
Prints one JSON line per mode on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


QUESTIONS_ZH = [
    "买卖合同的标的物质量要求", "抵押权的设立与登记", "租赁合同解除的条件",
    "无权代理的法律后果", "保证人的追偿权", "不当得利的返还范围",
    "侵权责任的构成要件", "夫妻共同财产的认定", "遗嘱继承的效力",
    "建设工程合同价款优先受偿", "格式条款无效的情形", "诉讼时效中断的事由",
    "质权与留置权的区别", "赠与合同的任意撤销", "居住权的设立",
    "承揽合同中的瑕疵担保",
]


def run_mode(url: str, clients: int, per_client: int) -> dict:
    lat: list = []
    errors: list = []
    lock = threading.Lock()
    barrier = threading.Barrier(clients)

    def worker(ci: int):
        barrier.wait()
        for ri in range(per_client):
            q = QUESTIONS_ZH[(ci * per_client + ri) % len(QUESTIONS_ZH)]
            body = json.dumps({"question": q, "top_k": 10}).encode()
            req = urllib.request.Request(
                url + "/rag/retrieve", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    d = json.loads(r.read().decode())
                    assert d.get("hits"), "empty hits"
            except Exception as e:
                with lock:
                    errors.append(str(e))
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    arr = np.asarray(sorted(lat))

    def pct(p):
        if not len(arr):
            return None
        return round(float(arr[min(int(len(arr) * p), len(arr) - 1)])
                     * 1e3, 1)

    if errors:  # first few error strings, for diagnosability
        log(f"  errors ({len(errors)}): " + "; ".join(
            sorted(set(errors))[:3]))
    return {
        "requests": len(lat), "errors": len(errors),
        "wall_s": round(wall, 3),
        "qps": round(len(lat) / wall, 1),
        "p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99),
        "max_ms": round(float(arr[-1]) * 1e3, 1) if len(arr) else None,
    }


def batcher_stats() -> dict:
    """Summarize the in-process micro-batcher histograms (the server runs
    in this process): where p95 requests spend their time — queue wait vs
    device execution — plus batch geometry (VERDICT r2 #8)."""
    from legalrag_tpu.utils.metrics import METRICS, _BUCKETS

    out = {}
    with METRICS._lock:
        counters = dict(METRICS._counters)
        hists = {k: (list(v[0]), v[1], v[2])
                 for k, v in METRICS._hist.items()}

    def hist_summary(name):
        for (n, _labels), (buckets, total, count) in hists.items():
            if n == name and count:
                # approximate p95 from the fixed buckets
                cum, p95 = 0, None
                for ub, c in zip(list(_BUCKETS) + [float("inf")], buckets):
                    cum += c
                    if p95 is None and cum >= 0.95 * count:
                        p95 = ub
                return {"mean_ms": round(total / count * 1e3, 1),
                        "p95_le_ms": (round(p95 * 1e3, 1)
                                      if p95 != float("inf") else ">10000"),
                        "count": count}
        return None

    def counter(name):
        for (n, _labels), v in counters.items():
            if n == name:
                return v
        return 0.0

    execs = counter("legalrag_microbatch_executions")
    out["wait"] = hist_summary("legalrag_microbatch_wait_seconds")
    out["exec"] = hist_summary("legalrag_microbatch_exec_seconds")
    if execs:
        out["avg_batch"] = round(
            counter("legalrag_microbatch_batched_requests") / execs, 2)
        out["avg_queue_depth"] = round(
            counter("legalrag_microbatch_queue_depth_sum") / execs, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8,
                    help="requests per client")
    ap.add_argument("--window-ms", type=float, default=2.0)
    ap.add_argument("--modes", default="off,on")
    ap.add_argument("--device", choices=("cpu", "default"), default="cpu",
                    help="cpu pins everything to host; default uses the "
                    "session device (TPU) — the configuration the "
                    "micro-batcher is built for")
    args = ap.parse_args()

    from legalrag_tpu.config import AppConfig
    from legalrag_tpu.utils.device import apply_force_cpu

    if args.device == "cpu":
        # apply_force_cpu is env-gated; set the env first or the flag
        # silently benchmarks the TPU default device under a "cpu" label
        os.environ["LEGALRAG_FORCE_CPU"] = "1"
        apply_force_cpu()
    from legalrag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    for mode in args.modes.split(","):
        cfg = AppConfig.load()
        if mode == "off":
            cfg.engine.microbatch_max = 1
            cfg.engine.microbatch_window_ms = 0.0
        else:
            cfg.engine.microbatch_window_ms = args.window_ms
        from legalrag_tpu.api.server import create_app

        app = create_app(cfg, build_async=False)
        server = app.serve("127.0.0.1", 0)
        url = f"http://127.0.0.1:{server.server_address[1]}"
        # Deterministically pre-warm EVERY batch-bucket program the
        # measurement can hit: a bucket first seen mid-measurement pays
        # the relay's multi-minute program load inside a timed request
        # (it showed up as a 9 s p95 outlier before this).
        from legalrag_tpu.retrieval.engine import bucket_batch

        max_b = args.clients if mode != "off" else 1
        buckets = sorted({bucket_batch(n) for n in range(1, max_b + 1)})
        for b in buckets:
            warm = run_mode(url, b, 1)
            log(f"[{mode}] warm bucket {b}: {warm}")
        warm = run_mode(url, min(args.clients, 16), 2)
        log(f"[{mode}] warmup: {warm}")
        stats0 = batcher_stats()
        res = run_mode(url, args.clients, args.requests)
        res.update({"metric": "serving_concurrent_qps", "mode": mode,
                    "clients": args.clients})
        if mode != "off":
            # measurement-window batcher stats (histograms are cumulative;
            # counts include warmup — report both for the delta)
            res["batcher"] = batcher_stats()
            res["batcher_prewarm"] = stats0
        log(f"[{mode}] {res}")
        print(json.dumps(res), flush=True)
        server.shutdown()


if __name__ == "__main__":
    main()
