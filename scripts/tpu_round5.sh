#!/usr/bin/env bash
# Round-5 TPU measurement queue. Re-measures every round-4 backlog point
# ON THE FIXED CODE (spec full-window drafting, paged gather-per-launch,
# int4 packed carrier) plus the never-run round-4 kernel/roofline items
# (VERDICT r4 #6). Serialized — ONE CPU core on this box; never run
# pytest/benches concurrently. Logs to /tmp/tpu_round5/; one-line status
# per step in /tmp/tpu_round5/STATUS. Safe to re-run (steps idempotent).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_round5
mkdir -p "$OUT"
note() { echo "$(date -u +%FT%TZ) $*" | tee -a "$OUT/STATUS"; }

note "round5 queue start"

if ! timeout 420 python -c "import jax; x=jax.numpy.ones((256,256)); (x@x).block_until_ready()" \
    >"$OUT/probe.log" 2>&1; then
  note "probe FAILED - relay down; aborting"
  exit 1
fi
note "probe ok"

# --- the three round-5 fixes, measured first -------------------------------

# 1. speculation with the full-window drafting fix: oracle (ceiling) and
#    default. r4 on-chip: 0.2x / 1.27 accepted (oracle), 0.16x / 1.01.
timeout 3600 python -m scripts.bench_decode --spec 8 --spec-oracle \
  >"$OUT/decode_spec_oracle.json" 2>"$OUT/decode_spec_oracle.log" \
  && note "spec-oracle ok: $(cat "$OUT/decode_spec_oracle.json")" \
  || note "spec-oracle FAILED"

timeout 3600 python -m scripts.bench_decode --spec 8 \
  >"$OUT/decode_spec.json" 2>"$OUT/decode_spec.log" \
  && note "spec ok: $(cat "$OUT/decode_spec.json")" \
  || note "spec FAILED"

# 2. paged KV with launch-level gather/scatter. r4 on-chip: 0.06x of
#    contiguous, radix TTFT 1.01x.
timeout 3600 python -m scripts.bench_decode --paged 4 \
  >"$OUT/decode_paged.json" 2>"$OUT/decode_paged.log" \
  && note "paged ok: $(cat "$OUT/decode_paged.json")" \
  || note "paged FAILED"

# 3. int4 weights with the packed-int8 carrier. r4 on-chip: CRASH
#    (RecursionError on S4 device_put).
timeout 3600 python -m scripts.bench_decode --weight-quant --weight-bits 4 \
  --chunks 8,128 \
  >"$OUT/decode_wquant4.json" 2>"$OUT/decode_wquant4.log" \
  && note "wquant4 ok: $(cat "$OUT/decode_wquant4.json")" \
  || note "wquant4 FAILED"

# --- headline + unchanged-engine re-measurements ---------------------------

# 4. driver headline (hybrid q/s vs CPU baseline) with secondaries; the
#    backlog run owns BENCH_secondary.json (bench.py skips secondaries
#    itself when the driver's process sees a cold relay)
LEGALRAG_BENCH_TOTAL_BUDGET=3600 timeout 4200 python bench.py \
  >"$OUT/bench.json" 2>"$OUT/bench.log" \
  && note "bench.py ok: $(cat "$OUT/bench.json")" \
  || note "bench.py FAILED (see bench.log)"

# 5. engines untouched by round 5 (re-confirm on the current code)
timeout 3600 python -m scripts.bench_decode --batched 4 \
  >"$OUT/decode_batched.json" 2>"$OUT/decode_batched.log" \
  && note "batched ok: $(cat "$OUT/decode_batched.json")" \
  || note "batched FAILED"

timeout 3600 python -m scripts.bench_decode --prefix-cache 448 \
  >"$OUT/decode_prefix.json" 2>"$OUT/decode_prefix.log" \
  && note "prefix ok: $(cat "$OUT/decode_prefix.json")" \
  || note "prefix FAILED"

timeout 3600 python -m scripts.bench_decode --kv-quant --chunks 8,128 \
  >"$OUT/decode_kvquant.json" 2>"$OUT/decode_kvquant.log" \
  && note "kvquant ok: $(cat "$OUT/decode_kvquant.json")" \
  || note "kvquant FAILED"

timeout 3600 python -m scripts.bench_decode --weight-quant --chunks 8,128 \
  >"$OUT/decode_wquant.json" 2>"$OUT/decode_wquant.log" \
  && note "wquant ok: $(cat "$OUT/decode_wquant.json")" \
  || note "wquant FAILED"

# 5b. plain decode + prefill at the roofline model's geometry (bf16
#     weights — the weight-bytes=2 row of the roofline table)
timeout 3600 python -m scripts.bench_decode --chunks 8,128 \
  >"$OUT/decode_plain.json" 2>"$OUT/decode_plain.log" \
  && note "plain ok: $(cat "$OUT/decode_plain.json")" \
  || note "plain FAILED"

# 6. draft-MODEL speculation cost (in-program draft scan; random-init
#    acceptance is a floor — the per-round carry cost is the number)
timeout 3600 python -m scripts.bench_decode --spec 8 --draft-layers 4 \
  >"$OUT/decode_spec_draft.json" 2>"$OUT/decode_spec_draft.log" \
  && note "spec-draft ok: $(cat "$OUT/decode_spec_draft.json")" \
  || note "spec-draft FAILED"

# --- round-4 kernel/roofline items that never ran (VERDICT r4 #6) ----------

# 7. select-variant shootout at B=256 / N=1M (mask vs masked vs bf16)
timeout 3600 python -m scripts.bench_kernels --sizes 1048576 --batch 256 \
  --skip-maxsim --variants mask,masked,bf16 \
  >"$OUT/select_1m.json" 2>"$OUT/select_1m.log" \
  && note "select variants ok: $(tail -c 400 "$OUT/select_1m.json")" \
  || note "select variants FAILED"

# 8. 1M-doc scale points: unit-int8 dense store + per-stage breakdown
timeout 3600 python -m scripts.bench_scale --n-docs 1048576 --iters 5 \
  --dense-dtype int8 \
  >"$OUT/scale_int8.json" 2>"$OUT/scale_int8.log" \
  && note "scale int8 ok: $(cat "$OUT/scale_int8.json")" \
  || note "scale int8 FAILED"

timeout 5400 python -m scripts.bench_scale --n-docs 1048576 --iters 5 \
  --breakdown \
  >"$OUT/breakdown_1m.json" 2>"$OUT/breakdown_1m.log" \
  && note "breakdown ok: $(tail -c 400 "$OUT/breakdown_1m.json")" \
  || note "breakdown FAILED"

# 9. the roofline/MFU table EVAL.md promises: assemble measured ms per
#    stage key from the breakdown + decode benches, then run the model
python - <<'PY' >"$OUT/meas.json" 2>"$OUT/meas.log" || true
import json, sys
meas = {}
try:
    for line in open("/tmp/tpu_round5/breakdown_1m.json"):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("metric") == "scale_stage_ms":
                meas[d["stage"]] = d["value"]
except OSError as e:
    print(f"breakdown missing: {e}", file=sys.stderr)
try:
    d = json.loads(open("/tmp/tpu_round5/decode_plain.json").read()
                   .strip().splitlines()[-1])
    meas["decode_step"] = 1000.0 / d["by_chunk"]["128"]
    meas["prefill"] = d["prompt_len"] / d["prefill_tok_per_s"] * 1000.0
except Exception as e:
    print(f"decode_plain missing: {e}", file=sys.stderr)
print(json.dumps(meas))
PY
timeout 600 python -m scripts.roofline --json "$OUT/meas.json" \
  >"$OUT/roofline.txt" 2>"$OUT/roofline.log" \
  && note "roofline ok (see roofline.txt)" \
  || note "roofline FAILED"

note "round5 queue done"
