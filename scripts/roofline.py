"""Roofline / MFU accounting for the production TPU programs.

VERDICT r3 #3: publish, for each production program, the modeled FLOPs
and HBM bytes against the measured time — "fast" must mean "% of the
chip's roofline", not "faster than CPU". This script holds the analytic
cost model; measured milliseconds come from the bench JSONs
(`scripts/bench_scale.py --breakdown`, `scripts/bench_kernels.py`,
`scripts/bench_decode.py`) and are passed in — the model never invents a
measurement.

Chip model (v5e defaults, override via flags for other parts):
peak bf16 MXU 197 TFLOP/s, int8 394 TOP/s, HBM 819 GB/s, 16 GB.
A stage's ROOFLINE time is max(flops/peak, bytes/bw); %roofline =
roofline/measured (100% = at the hardware limit). Stages whose cost is
neither (e.g. the bitonic sort network of the sparse-BM25 stage: its
gathers are small and its cost is log²M sorting stages of VPU work)
carry a note instead of a misleading number.

Usage:
  python -m scripts.roofline                    # table with the stage
                                                # models + any measured
                                                # ms supplied via --json
  python -m scripts.roofline --json meas.json   # {"stage": ms, ...}

The EVAL.md round-4 roofline table is generated from this (single
source of truth for the arithmetic).
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

GB = 1e9


@dataclass
class Chip:
    bf16_flops: float = 197e12   # v5e MXU peak, bf16
    int8_ops: float = 394e12
    hbm_bw: float = 819e9        # bytes/s
    name: str = "v5e"


@dataclass
class Stage:
    key: str                     # measured-json key
    label: str
    flops: float                 # per batch
    bytes_: float                # HBM bytes per batch (dominant streams)
    note: str = ""
    int8: bool = False           # score on the int8 MXU path

    def roofline_ms(self, chip: Chip) -> float:
        peak = chip.int8_ops if self.int8 else chip.bf16_flops
        return max(self.flops / peak, self.bytes_ / chip.hbm_bw) * 1e3

    def bound(self, chip: Chip) -> str:
        peak = chip.int8_ops if self.int8 else chip.bf16_flops
        return ("HBM" if self.bytes_ / chip.hbm_bw >= self.flops / peak
                else "MXU")


def fused_hybrid_stages(n_docs: int, batch: int = 64, d: int = 768,
                        doc_len: int = 64, token_dim: int = 128,
                        candidates: int = 128, eff_k: int = 64,
                        dense_bytes: int = 1, map_bytes: int = 4,
                        token_bytes: int = 1, max_postings: int = 65536,
                        ) -> List[Stage]:
    """The fused hybrid retrieval program (ops/fused_query.py) at the
    bench_scale geometry: dense unit-int8 store by default
    (dense_bytes=1), f32 [B, N] score map (map_bytes=4; 2 under
    --dense-map bfloat16), int8 token store."""
    b = batch
    return [
        Stage(
            "dense_dot_only", f"dense score map (B={b}, N={n_docs})",
            flops=2.0 * b * n_docs * d,
            # read the embedding store once + write the [B, N] map once
            bytes_=n_docs * d * dense_bytes + b * n_docs * map_bytes,
            int8=dense_bytes == 1,
            note="store read + map write"),
        Stage(
            "dense_topk_2pass", f"two-pass top-k over the map",
            flops=2.0 * b * n_docs,      # block max + compares (VPU-ish)
            # pass 1 reads the [B, N] map; pass 2 gathers k·512 survivors
            bytes_=b * n_docs * map_bytes + b * eff_k * 512 * map_bytes,
            note="map read dominates"),
        Stage(
            "bm25_merge_network", "sparse BM25 top-k (merge network)",
            flops=0.0, bytes_=b * max_postings * 8,
            note="NOT roofline-modeled: cost is the log2(T)-level "
                 "bitonic merge tree over M postings (VPU sort stages, "
                 "N-independent); gathers are small"),
        Stage(
            "maxsim_candidates",
            f"candidate MaxSim (C={candidates}, T={doc_len})",
            flops=2.0 * b * candidates * doc_len * 16 * token_dim,
            bytes_=b * candidates * doc_len * token_dim * token_bytes,
            int8=token_bytes == 1,
            note="token-store gather dominates"),
        Stage(
            "list_fusion", "3-list RRF/affine fusion",
            flops=6.0 * b * eff_k, bytes_=b * eff_k * 3 * 8,
            note="negligible by construction"),
    ]


def decode_step_stage(n_params: float, kv_tokens: int, n_layers: int,
                      kv_heads: int, head_dim: int, batch: int = 1,
                      weight_bytes: float = 2.0, kv_bytes: float = 2.0,
                      ) -> Stage:
    """One decode step: every weight byte streams once per step
    (batch-amortized), plus the KV read at the current context length.
    FLOPs 2·P per token — decode is HBM-bound at any realistic batch."""
    kv = n_layers * kv_tokens * kv_heads * head_dim * 2 * kv_bytes
    return Stage(
        "decode_step", f"decode step (P={n_params/1e9:.2f}B, "
        f"ctx={kv_tokens}, B={batch})",
        flops=2.0 * n_params * batch,
        bytes_=n_params * weight_bytes + batch * kv,
        note="weights stream once per step; batching amortizes")


def prefill_stage(n_params: float, tokens: int,
                  weight_bytes: float = 2.0) -> Stage:
    """Chunked prefill: 2·P FLOPs per token; weights stream once per
    chunk — MXU-bound for chunks past ~bw·2P/peak tokens."""
    return Stage(
        "prefill", f"prefill ({tokens} tokens)",
        flops=2.0 * n_params * tokens,
        bytes_=n_params * weight_bytes + 0.0,
        note="MXU-bound past the chunk-size crossover")


def render(stages: List[Stage], measured: Dict[str, float],
           chip: Chip) -> str:
    rows = ["| stage | bound | model FLOPs | model HBM bytes | "
            "roofline ms | measured ms | % of roofline |",
            "|---|---|---|---|---|---|---|"]
    for s in stages:
        ms = measured.get(s.key)
        roof = s.roofline_ms(chip)
        if s.flops == 0.0 and "NOT roofline" in s.note:
            pct = "n/a (sort-network)"
            roof_s = "—"
        else:
            roof_s = f"{roof:.2f}"
            pct = (f"{100.0 * roof / ms:.0f}%" if ms else "pending")
        rows.append(
            f"| {s.label} | {s.bound(chip) if s.flops else 'VPU'} | "
            f"{s.flops / 1e9:.1f} G | {s.bytes_ / GB:.2f} GB | {roof_s} | "
            f"{f'{ms:.2f}' if ms else 'pending'} | {pct} |")
    return "\n".join(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None,
                    help="measured ms per stage key (JSON object)")
    ap.add_argument("--n-docs", type=int, default=1048576)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dense-bytes", type=int, default=1,
                    help="dense store bytes/elt (1=unit-int8, 2=bf16)")
    ap.add_argument("--map-bytes", type=int, default=4,
                    help="[B,N] score-map bytes/elt (4=f32, 2=bf16)")
    ap.add_argument("--decode-params-b", type=float, default=0.494,
                    help="decoder params STREAMED per step, billions "
                    "(default: bench_decode's Qwen2.5-0.5B-shape model — "
                    "24 layers ≈358M + tied lm_head matmul 136M; the "
                    "embed row gather is free)")
    ap.add_argument("--decode-ctx", type=int, default=640)
    ap.add_argument("--decode-layers", type=int, default=24)
    ap.add_argument("--decode-kv-heads", type=int, default=2)
    ap.add_argument("--decode-head-dim", type=int, default=64)
    ap.add_argument("--weight-bytes", type=float, default=2.0,
                    help="bytes per weight (2=bf16 bench params, "
                    "1=int8, 0.5=int4)")
    ap.add_argument("--prefill-tokens", type=int, default=512)
    args = ap.parse_args()

    measured: Dict[str, float] = {}
    if args.json:
        measured = json.loads(open(args.json, encoding="utf-8").read())

    chip = Chip()
    p = args.decode_params_b * 1e9
    stages = fused_hybrid_stages(args.n_docs, args.batch,
                                 dense_bytes=args.dense_bytes,
                                 map_bytes=args.map_bytes)
    stages.append(decode_step_stage(p, args.decode_ctx,
                                    args.decode_layers,
                                    args.decode_kv_heads,
                                    args.decode_head_dim,
                                    weight_bytes=args.weight_bytes))
    stages.append(prefill_stage(p, args.prefill_tokens,
                                weight_bytes=args.weight_bytes))
    print(f"chip: {chip.name} (bf16 {chip.bf16_flops/1e12:.0f} TF/s, "
          f"int8 {chip.int8_ops/1e12:.0f} TOP/s, "
          f"HBM {chip.hbm_bw/1e9:.0f} GB/s)")
    print(render(stages, measured, chip))


if __name__ == "__main__":
    main()
