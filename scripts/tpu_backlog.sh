#!/usr/bin/env bash
# TPU measurement backlog — run when the axon relay comes back after an
# outage. Serializes every pending TPU benchmark (ONE CPU core on this
# box; never run these concurrently with pytest or other benches — see
# docs/operations.md). Each step logs to /tmp/tpu_backlog/ and appends a
# one-line status to /tmp/tpu_backlog/STATUS so progress survives the
# session. Safe to re-run: steps are independent and idempotent.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_backlog
mkdir -p "$OUT"
note() { echo "$(date -u +%FT%TZ) $*" | tee -a "$OUT/STATUS"; }

note "backlog start"

# 0. relay probe (fail fast if it is still down)
if ! timeout 420 python -c "import jax; x=jax.numpy.ones((256,256)); (x@x).block_until_ready()" \
    >"$OUT/probe.log" 2>&1; then
  note "probe FAILED - relay still down; aborting"
  exit 1
fi
note "probe ok"

# 1. the driver headline (hybrid q/s vs CPU baseline) — ~25-30 min
timeout 3600 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.log" \
  && note "bench.py ok: $(cat "$OUT/bench.json")" \
  || note "bench.py FAILED (see bench.log)"

# 2. decode engines (round-3 additions, never TPU-measured: NEXT.md #2)
timeout 3600 python -m scripts.bench_decode --batched 4 \
  >"$OUT/decode_batched.json" 2>"$OUT/decode_batched.log" \
  && note "bench_decode --batched 4 ok: $(cat "$OUT/decode_batched.json")" \
  || note "bench_decode --batched FAILED"

timeout 3600 python -m scripts.bench_decode --spec 8 \
  >"$OUT/decode_spec.json" 2>"$OUT/decode_spec.log" \
  && note "bench_decode --spec 8 ok: $(cat "$OUT/decode_spec.json")" \
  || note "bench_decode --spec FAILED"

timeout 3600 python -m scripts.bench_decode --prefix-cache 448 \
  >"$OUT/decode_prefix.json" 2>"$OUT/decode_prefix.log" \
  && note "bench_decode --prefix-cache ok: $(cat "$OUT/decode_prefix.json")" \
  || note "bench_decode --prefix-cache FAILED"

# 3. int8 KV cache decode cost (round-3 late addition)
timeout 3600 python -m scripts.bench_decode --kv-quant --chunks 8,128 \
  >"$OUT/decode_kvquant.json" 2>"$OUT/decode_kvquant.log" \
  && note "bench_decode --kv-quant ok: $(cat "$OUT/decode_kvquant.json")" \
  || note "bench_decode --kv-quant FAILED"

# 4. int8 weight quantization (W8A8) — the headline is speedup_vs_dense:
# decode streams every weight byte per token, int8 halves that read
timeout 3600 python -m scripts.bench_decode --weight-quant --chunks 8,128 \
  >"$OUT/decode_wquant.json" 2>"$OUT/decode_wquant.log" \
  && note "bench_decode --weight-quant ok: $(cat "$OUT/decode_wquant.json")" \
  || note "bench_decode --weight-quant FAILED"

# 4b. unit-int8 dense store at 1M docs — halves the dense HBM stream;
# recall-neutral on the real corpora (EVAL.md). Compare to the bf16
# large_n figure in BENCH.
timeout 3600 python -m scripts.bench_scale --n-docs 1048576 --iters 5 \
  --dense-dtype int8 \
  >"$OUT/scale_int8.json" 2>"$OUT/scale_int8.log" \
  && note "bench_scale --dense-dtype int8 ok: $(cat "$OUT/scale_int8.json")" \
  || note "bench_scale --dense-dtype int8 FAILED"

# 5. int4 weights — quarter-bf16 weight stream; XLA-native s4 packing
timeout 3600 python -m scripts.bench_decode --weight-quant --weight-bits 4 \
  --chunks 8,128 \
  >"$OUT/decode_wquant4.json" 2>"$OUT/decode_wquant4.log" \
  && note "bench_decode --weight-bits 4 ok: $(cat "$OUT/decode_wquant4.json")" \
  || note "bench_decode --weight-bits 4 FAILED"

# 6. paged-KV engine: paging overhead vs contiguous batched at equal
# occupancy + radix prefix-reuse TTFT (round-4 addition)
timeout 3600 python -m scripts.bench_decode --paged 4 \
  >"$OUT/decode_paged.json" 2>"$OUT/decode_paged.log" \
  && note "bench_decode --paged 4 ok: $(cat "$OUT/decode_paged.json")" \
  || note "bench_decode --paged FAILED"

# 7. speculation ceiling: oracle n-gram table (near-full acceptance, the
# deployment case where answers quote corpus provisions). Random-init
# default acceptance ~0 says nothing about the machinery.
timeout 3600 python -m scripts.bench_decode --spec 8 --spec-oracle \
  >"$OUT/decode_spec_oracle.json" 2>"$OUT/decode_spec_oracle.log" \
  && note "bench_decode --spec 8 --spec-oracle ok: $(cat "$OUT/decode_spec_oracle.json")" \
  || note "bench_decode --spec-oracle FAILED"

note "backlog done"
