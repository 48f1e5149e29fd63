#!/usr/bin/env bash
# Round-5 follow-up TPU measurements — benches whose METHODOLOGY was fixed
# after the main round-5 queue launched:
#   * paged: per-pass timing, no-reuse steady state (fresh prompts) vs a
#     separately-warmed radix-reuse pass — the main queue's 0.09x timed
#     first-execution of reuse-path prefill buckets, not the engine
#   * spec --spec-adaptive: the production default (llm.spec_adaptive=2)
#     must converge to ~plain decode when acceptance is low
# Serialized (ONE CPU core). Logs to /tmp/tpu_round5b/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_round5b
mkdir -p "$OUT"
note() { echo "$(date -u +%FT%TZ) $*" | tee -a "$OUT/STATUS"; }

note "round5b queue start"

if ! timeout 420 python -c "import jax; x=jax.numpy.ones((256,256)); (x@x).block_until_ready()" \
    >"$OUT/probe.log" 2>&1; then
  note "probe FAILED - relay down; aborting"
  exit 1
fi
note "probe ok"

timeout 3600 python -m scripts.bench_decode --paged 4 \
  >"$OUT/decode_paged.json" 2>"$OUT/decode_paged.log" \
  && note "paged ok: $(cat "$OUT/decode_paged.json")" \
  || note "paged FAILED"

timeout 3600 python -m scripts.bench_decode --spec 8 --spec-adaptive 2.0 \
  >"$OUT/decode_spec_adaptive.json" 2>"$OUT/decode_spec_adaptive.log" \
  && note "spec-adaptive ok: $(cat "$OUT/decode_spec_adaptive.json")" \
  || note "spec-adaptive FAILED"

# batched re-run: the main round-5 queue measured 0.98x vs sequential
# (r4: 1.35x, engine unchanged); settle whether that was process-local
# relay variance (the int8 step's in-process dense baseline was 590
# while the batched step's sequential was 418)
timeout 3600 python -m scripts.bench_decode --batched 4 \
  >"$OUT/decode_batched.json" 2>"$OUT/decode_batched.log" \
  && note "batched ok: $(cat "$OUT/decode_batched.json")" \
  || note "batched FAILED"

note "round5b queue done"
