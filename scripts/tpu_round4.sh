#!/usr/bin/env bash
# Round-4 TPU measurements (run AFTER scripts/tpu_backlog.sh drains):
# the 1M-doc selection-gap attack (VERDICT r3 #3) + per-stage roofline
# inputs. Serialized; logs to /tmp/tpu_round4/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_round4
mkdir -p "$OUT"
note() { echo "$(date -u +%FT%TZ) $*" | tee -a "$OUT/STATUS"; }

note "round4 queue start"

if ! timeout 420 python -c "import jax; x=jax.numpy.ones((256,256)); (x@x).block_until_ready()" \
    >"$OUT/probe.log" 2>&1; then
  note "probe FAILED - relay down; aborting"
  exit 1
fi
note "probe ok"

# 1. the VERDICT-flagged point, three ways: full-mask baseline was
#    measured r03 at 9.8 ms (B=256, N=1M); the masked two-pass and the
#    bf16 map + exact rescore are the round-4 candidates.
timeout 3600 python -m scripts.bench_kernels --sizes 1048576 --batch 256 \
  --skip-maxsim --variants mask,masked,bf16 \
  >"$OUT/select_1m.json" 2>"$OUT/select_1m.log" \
  && note "select variants ok: $(tail -c 400 "$OUT/select_1m.json")" \
  || note "select variants FAILED"

# 2. 1M fused hybrid with the bf16 dense map (compare BENCH large_n /
#    backlog scale_int8 figures)
timeout 3600 python -m scripts.bench_scale --n-docs 1048576 --iters 5 \
  --dense-map bfloat16 \
  >"$OUT/scale_bf16map.json" 2>"$OUT/scale_bf16map.log" \
  && note "scale --dense-map bfloat16 ok: $(cat "$OUT/scale_bf16map.json")" \
  || note "scale bf16map FAILED"

# 3. per-stage breakdown at 1M (roofline table inputs: names where the
#    270.9 ms/batch64 goes)
timeout 5400 python -m scripts.bench_scale --n-docs 1048576 --iters 5 \
  --breakdown \
  >"$OUT/breakdown_1m.json" 2>"$OUT/breakdown_1m.log" \
  && note "breakdown ok: $(grep -c scale_stage_ms "$OUT/breakdown_1m.json" || true) stages" \
  || note "breakdown FAILED"

# 4. paged-KV engine on-chip (VERDICT r3 #4): admission/TTFT + HBM-
#    sharing vs the contiguous batched engine
timeout 3600 python -m scripts.bench_decode --paged 4 --chunks 8,64 \
  >"$OUT/decode_paged.json" 2>"$OUT/decode_paged.log" \
  && note "bench_decode --paged ok: $(cat "$OUT/decode_paged.json")" \
  || note "bench_decode --paged FAILED"

note "round4 queue done"
