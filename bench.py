"""Benchmark: hybrid retrieval throughput per chip vs a CPU reference-style
baseline.

Prints ONE JSON line:
    {"metric": "hybrid_qps_per_chip", "value": <tpu qps>,
     "unit": "queries/s", "vs_baseline": <tpu/cpu ratio>}

Ordering contract (round-3 lesson: rc=124 with parsed=null): the headline
JSON line hits stdout — flushed — the moment the TPU passes and the CPU
baseline finish. Secondary figures (1M-doc scale point, fused-BERT
backend) run AFTER under a wall-clock budget, log to stderr, and are
written to BENCH_secondary.json; they can never delay or lose the
headline again.

Workload: the zh Civil Code index (1,260 articles — the reference's primary
eval corpus, BASELINE.md). Queries are sentences sampled from articles
(deterministic). The measured path is the full production query path: host
query encode (hash features) → the fused device program (dense + BM25 +
full-corpus MaxSim channels, RRF/min-max fusion, final top-k) → host
id return.

The CPU baseline mirrors the reference CPU hybrid's shape with *stronger*
numerics than the reference actually has (BLAS matmuls everywhere instead
of rank_bm25's pure-Python scoring loop; MaxSim over dense-prefiltered
candidates like a PLAID-style reranker), so the reported speedup is a
lower bound on the true gap. Diagnostics (incl. Recall@10 parity between
the two paths) go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BATCH = 64
N_QUERIES = 1024
TOP_K = 10
_START = time.monotonic()   # total-budget anchor (includes index load)


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def ensure_index(cfg, lang: str):
    import jax

    from legalrag_tpu.corpus import load_chunks_from_dir, parse_auto, write_chunks_jsonl
    from legalrag_tpu.index.bundle import IndexBundle, StaleIndexError

    lang_cfg = cfg.with_lang(lang)
    index_dir = Path(lang_cfg.paths.lang_index_dir)
    if IndexBundle.exists(index_dir):
        try:
            return IndexBundle.load(index_dir, lang_cfg, lang)
        except StaleIndexError as e:
            log(f"stale index, rebuilding: {e}")
    processed = Path(cfg.paths.processed_dir)
    chunks = [c for c in load_chunks_from_dir(processed) if c.lang == lang]
    if not chunks:
        raw = Path(cfg.paths.raw_dir)
        for p in sorted(raw.rglob("*.txt")):
            text = p.read_text(encoding="utf-8", errors="replace")
            if text.strip():
                recs = parse_auto(text, source=p.name)
                chunks += [r.to_chunk() for r in recs if r.lang == lang]
        write_chunks_jsonl(chunks, processed / f"law_{lang}.jsonl")
    log(f"building {lang} index over {len(chunks)} chunks (cpu)")
    bundle = IndexBundle.build_from_chunks(chunks, lang_cfg, lang,
                                           device=jax.devices("cpu")[0])
    bundle.save(index_dir)
    return IndexBundle.load(index_dir, lang_cfg, lang)


def make_queries(bundle, n: int, seed: int = 0):
    """Sentence-sampled queries with gold rows (self-retrieval eval)."""
    import re

    rng = np.random.default_rng(seed)
    rows = rng.permutation(bundle.n_docs)
    queries, gold = [], []
    for row in rows:
        text = bundle.chunks[int(row)].text
        sents = [s for s in re.split(r"[。；！? .;!?\n]", text)
                 if 8 <= len(s) <= 80]
        if not sents:
            continue
        queries.append(sents[rng.integers(len(sents))])
        gold.append(int(row))
        if len(queries) >= n:
            break
    return queries, np.asarray(gold)


# ---------------------------------------------------------------- baseline
class CpuBaseline:
    """Reference-shaped CPU hybrid: exact dense (BLAS), BM25 impact (BLAS),
    MaxSim over dense-prefiltered candidates, host RRF fusion."""

    def __init__(self, bundle, cfg):
        self.cfg = cfg
        self.enc = bundle.encoder
        self.emb = np.asarray(bundle.dense.emb[: bundle.dense.n], np.float32)
        self.impact = np.asarray(bundle.bm25.impact, np.float32)[:, : bundle.bm25.n]
        self.bm25 = bundle.bm25
        self.tok = np.asarray(bundle.tokens.tok[: bundle.tokens.n], np.float32)
        self.mask = np.asarray(bundle.tokens.mask[: bundle.tokens.n])
        self.maxq = cfg.engine.max_query_tokens

    def search(self, questions, top_k):
        from legalrag_tpu.retrieval.fusion import ChannelResult, fuse

        r = self.cfg.retrieval
        eff = top_k * r.oversample_factor
        qv = self.enc.encode_queries(questions)  # host encode (same cost)
        qtf = self.bm25.query_vectors(questions)[:, : self.impact.shape[0]]
        qt, qm = self.enc.encode_tokens(questions, self.maxq,
                                        query=True)
        dense_s = qv @ self.emb.T
        bm25_s = qtf @ self.impact
        out_rows = np.empty((len(questions), top_k), np.int64)
        for qi in range(len(questions)):
            d_i = np.argpartition(-dense_s[qi], eff)[:eff]
            d_i = d_i[np.argsort(-dense_s[qi][d_i])]
            b_i = np.argpartition(-bm25_s[qi], eff)[:eff]
            b_i = b_i[np.argsort(-bm25_s[qi][b_i])]
            # late channel on dense-prefiltered candidates
            cand = d_i[:128]
            sim = np.einsum("qd,cld->cql", qt[qi], self.tok[cand])
            sim = np.where(self.mask[cand][:, None, :], sim, -np.inf)
            best = sim.max(axis=-1)
            best = np.where(np.isfinite(best), best, 0.0)
            best = np.where(qm[qi][None, :], best, 0.0)
            l_s = best.sum(axis=-1)
            order = np.argsort(-l_s)[:eff]
            fused = fuse([
                ChannelResult("dense", r.dense_weight, d_i, dense_s[qi][d_i]),
                ChannelResult("bm25", r.bm25_weight, b_i, bm25_s[qi][b_i]),
                ChannelResult("colbert", r.colbert_weight, cand[order],
                              l_s[order]),
            ], method=r.fusion_method, rrf_k=r.rrf_k, alpha=r.rrf_alpha)
            rows = [c.row for c in fused[:top_k]]
            rows += [rows[-1] if rows else 0] * (top_k - len(rows))
            out_rows[qi] = rows
        return out_rows


def recall_at(rows: np.ndarray, gold: np.ndarray, k: int) -> float:
    return float(np.mean([g in set(r[:k].tolist()) for r, g in
                          zip(rows, gold)]))


def main() -> None:
    import jax

    from legalrag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from legalrag_tpu.config import AppConfig
    from legalrag_tpu.retrieval.engine import FusedQueryEngine

    import os

    cfg = AppConfig.load()
    bundle = ensure_index(cfg, "zh")
    log(f"zh index: {bundle.n_docs} docs on {jax.default_backend()}")
    n_queries = (128 if os.environ.get("LEGALRAG_TPU_DOWN") == "1"
                 else N_QUERIES)  # keep the CPU fallback bounded
    queries, gold = make_queries(bundle, n_queries)
    if len(queries) > BATCH:
        # uniform batches only: a smaller-bucketed tail batch would break
        # the single stacked-rows fetch in one_pass
        keep = len(queries) // BATCH * BATCH
        queries, gold = queries[:keep], gold[:keep]
    batches = [queries[i:i + BATCH] for i in range(0, len(queries), BATCH)]

    engine = FusedQueryEngine(bundle, cfg.with_lang("zh"))

    # warmup / compile — one retry: the relay tunnel occasionally drops a
    # remote_compile response mid-read (observed: "response body closed
    # before all bytes were read"), and the headline must survive it
    t0 = time.perf_counter()
    try:
        engine.search_batch(batches[0], TOP_K)
    except jax.errors.JaxRuntimeError as e:
        log(f"warmup compile failed ({str(e)[:120]}); retrying once")
        time.sleep(10)
        engine.search_batch(batches[0], TOP_K)
    warmup_s = time.perf_counter() - t0
    log(f"tpu compile+warmup: {warmup_s:.1f}s")

    # phase-separated pipeline: (1) host encode + transfers for every batch,
    # (2) all executions back-to-back, (3) one sync + fetch. Remote backends
    # serialize executions against interleaved transfers; this ordering
    # keeps the device busy end-to-end.
    import jax.numpy as jnp

    def one_pass():
        t0 = time.perf_counter()
        prepared = [engine.prepare(batch, TOP_K) for batch in batches]
        in_flight = [engine.execute(p) for p in prepared]
        # stack on device so the host fetch is ONE buffer, not 2×n_batches
        # (each fetch is a ~25 ms round trip on remote backends)
        all_rows_np = np.asarray(jnp.stack([d[0]["rows"] for d in in_flight]))
        dt = time.perf_counter() - t0
        rows = [all_rows_np[i][: len(b), :TOP_K]
                for i, b in enumerate(batches)]
        return dt, np.concatenate(rows)

    # best-of-3: the remote-tunnel per-run variance is ±30%; best-pass is
    # the steady-state number (both sides measured the same way)
    passes = [one_pass() for _ in range(3)]
    tpu_dt, tpu_rows = min(passes, key=lambda p: p[0])
    tpu_qps = len(queries) / tpu_dt
    log(f"tpu: {len(queries)} queries in {tpu_dt:.2f}s (best of 3) -> "
        f"{tpu_qps:.1f} q/s; Recall@10={recall_at(tpu_rows, gold, 10):.3f}")

    baseline = CpuBaseline(bundle, cfg.with_lang("zh"))
    n_base = min(BATCH, len(queries))  # time one batch; extrapolate per-query
    cpu_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        base_rows = baseline.search(queries[:n_base], TOP_K)
        cpu_times.append(time.perf_counter() - t0)
    cpu_dt = min(cpu_times)
    cpu_qps = n_base / cpu_dt
    log(f"cpu baseline: {n_base} queries in {cpu_dt:.2f}s (best of 3) -> "
        f"{cpu_qps:.1f} q/s; Recall@10={recall_at(base_rows, gold[:n_base], 10):.3f}")

    tpu_down = os.environ.get("LEGALRAG_TPU_DOWN") == "1"
    out = {
        "metric": "hybrid_qps_per_chip",
        "value": round(tpu_qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
    }
    if tpu_down:
        # relay-outage fallback (see __main__ probe): the "tpu" side above
        # actually ran the fused engine on CPU — record that honestly and
        # skip the accelerator-scale secondary figures. Carry the last
        # driver-reproduced TPU figures so the outage line is readable in
        # isolation.
        out["tpu_unavailable"] = True
        try:
            prev = sorted(REPO.glob("BENCH_r*.json"))
            if prev:
                last = json.loads(prev[-1].read_text())
                last = last.get("parsed", last)  # driver wraps the line
                if last.get("value") and not last.get("tpu_unavailable"):
                    out["last_good_tpu"] = {
                        "from": prev[-1].name,
                        "value": last["value"],
                        "vs_baseline": last.get("vs_baseline"),
                    }
        except Exception as e:
            log(f"last-good lookup skipped: {e}")
        print(json.dumps(out), flush=True)
        return
    # headline FIRST (flushed): secondaries below may take tens of minutes
    # and must never cost the round its machine-readable benchmark
    print(json.dumps(out), flush=True)
    # Secondary budget, round-5 rules (rc=124 in rounds 3 AND 4 — the
    # driver kills the process before the secondaries finish):
    # - a COLD relay (warmup ≫ normal: the relay re-loads each big
    #   program server-side, ~2.5-12 min per fresh process) means each
    #   secondary subprocess will pay its own multi-minute load — skip
    #   them entirely; their numbers come from the in-round
    #   scripts/tpu_backlog.sh run, which commits BENCH_secondary.json.
    # - otherwise budget what remains of a total wall-clock envelope
    #   (default 1500 s) measured from process start.
    if warmup_s > float(os.environ.get("LEGALRAG_BENCH_COLD_S", "180")):
        log(f"cold relay (warmup {warmup_s:.0f}s): skipping secondaries "
            "(see BENCH_secondary.json from the in-round backlog run)")
        return
    total = float(os.environ.get("LEGALRAG_BENCH_TOTAL_BUDGET", "1500"))
    deadline = min(
        _START + total,
        time.monotonic() + float(
            os.environ.get("LEGALRAG_BENCH_SECONDARY_BUDGET", "2700")))
    secondary = {}
    large = measure_large_n(deadline)
    if large:
        secondary["large_n"] = large
    bert = measure_bert_backend(deadline)
    if bert:
        secondary["bert_backend"] = bert
    if secondary:
        log(f"secondary: {json.dumps(secondary)}")
        try:
            (REPO / "BENCH_secondary.json").write_text(
                json.dumps({"headline": out, **secondary}, indent=1))
        except OSError as e:
            log(f"secondary record not written: {e}")


def measure_bert_backend(deadline: float):
    """Secondary figure: the production-parity configuration — a
    BGE-base-shaped 12x768 encoder fused INTO the search program, one XLA
    execution per batch (VERDICT r1 #4). Random-init weights; throughput
    equals real BGE since shapes define the cost. Disable with
    LEGALRAG_BENCH_BERT=0."""
    import os
    import subprocess

    if os.environ.get("LEGALRAG_BENCH_BERT", "1") == "0":
        return None
    budget = deadline - time.monotonic()
    if budget < 300:
        log(f"bert-backend skipped (budget {budget:.0f}s)")
        return None
    try:
        p = subprocess.run(
            [sys.executable, "-m", "scripts.bench_bert",
             "--n-queries", "256"],
            capture_output=True, text=True, timeout=budget, cwd=str(REPO))
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            log(f"bert-backend skipped (no output; rc={p.returncode}): "
                f"{p.stderr[-300:]}")
            return None
        d = json.loads(lines[-1])
        log(f"bert-backend: {d}")
        return {"qps": d["value"], "batch": d["batch"]}
    except Exception as e:  # never fail the headline metric
        log(f"bert-backend skipped: {e}")
        return None


def measure_large_n(deadline: float):
    """Secondary figure: the MILLION-doc synthetic fused-hybrid program —
    the memory-capped regime where the round-3 two-pass top-k closes the
    selection bottleneck (VERDICT r2 #1; r2 recorded 65k here). Runs
    scripts.bench_scale in a subprocess, guarded so the primary metric
    never depends on it. Disable with LEGALRAG_BENCH_LARGE_N=0."""
    import os
    import subprocess

    if os.environ.get("LEGALRAG_BENCH_LARGE_N", "1") == "0":
        return None
    budget = deadline - time.monotonic()
    if budget < 300:
        log(f"large-N skipped (budget {budget:.0f}s)")
        return None
    try:
        p = subprocess.run(
            [sys.executable, "-m", "scripts.bench_scale",
             "--n-docs", "1048576", "--iters", "5"],
            capture_output=True, text=True, timeout=budget, cwd=str(REPO))
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            log(f"large-N skipped (no output; rc={p.returncode}): "
                f"{p.stderr[-300:]}")
            return None
        d = json.loads(lines[-1])
        log(f"large-N: {d}")
        return {"n_docs": d["n_docs"], "qps": d["value"],
                "token_dtype": d["token_dtype"]}
    except Exception as e:  # never fail the headline metric
        log(f"large-N skipped: {e}")
        return None


def _probe_backend_or_fallback() -> None:
    """The axon plugin's backend init blocks ~tens of minutes and then
    raises when the TPU relay is down (observed round 3) — which would end
    this process with NO JSON line for the driver. Probe the backend in a
    killable subprocess first; on failure, re-exec self with the plugin
    disabled so the headline still prints (CPU-measured, flagged
    ``tpu_unavailable``)."""
    import os
    import subprocess

    if os.environ.get("LEGALRAG_TPU_DOWN") == "1":
        return  # already in fallback mode
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no relay plugin in this environment; nothing to probe
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            check=True, capture_output=True, timeout=300)
        return
    except Exception as e:
        log(f"TPU backend probe failed ({type(e).__name__}); relay down — "
            "re-exec in CPU fallback mode")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["LEGALRAG_TPU_DOWN"] = "1"
    env["LEGALRAG_FORCE_CPU"] = "1"
    os.execve(sys.executable, [sys.executable, str(REPO / "bench.py")], env)


if __name__ == "__main__":
    _probe_backend_or_fallback()
    main()
