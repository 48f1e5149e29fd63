#!/usr/bin/env bash
# Round-5 CPU work, serialized (ONE core; run only when no TPU bench is
# in flight — the decode benches' host loop and bench.py's CPU baseline
# are both timing-sensitive).
#
#  1. en (+zh non-regression) held-out SEMANTIC retrieval eval with the
#     round-4/5 canonical section-ref tokens (VERDICT r4 #7): mine pairs,
#     eval untrained, train the projection, eval trained. Round-3 state:
#     en held fused R@10 0.514 (target >= 0.60), zh 0.946.
#  2. Regenerate stale artifacts (VERDICT r4 #8): generation_smoke with
#     budget-forced constrained decoding, the r2-hard50 eval export
#     EVAL.md cites, PARITY claims block.
# Logs to /tmp/cpu_round5/; one-line status per step in STATUS.
set -u
cd "$(dirname "$0")/.."
export LEGALRAG_FORCE_CPU=1
OUT=/tmp/cpu_round5
mkdir -p "$OUT"
note() { echo "$(date -u +%FT%TZ) $*" | tee -a "$OUT/STATUS"; }

note "cpu round5 start"

timeout 600 python -m scripts.preprocess_law >"$OUT/preprocess.log" 2>&1 \
  && note "preprocess ok" || note "preprocess FAILED"

timeout 1200 python -m scripts.build_graph >"$OUT/graph.log" 2>&1 \
  && note "graph ok" || note "graph FAILED"

# fresh indexes under the current tokenizer fingerprint (cue-gated doc
# secrefs); the bundle would refuse stale ones anyway
timeout 2400 python -m scripts.build_index >"$OUT/index.log" 2>&1 \
  && note "index ok" || note "index FAILED"

timeout 1200 python -m scripts.mine_semantic_pairs >"$OUT/mine.log" 2>&1 \
  && note "mine ok: $(tail -c 300 "$OUT/mine.log")" || note "mine FAILED"

for lang in en zh; do
  timeout 2400 python -m scripts.evaluate_retrieval \
    --eval-file "data/eval/semantic_${lang}_held.jsonl" \
    --systems bm25,dense,fused \
    --out-json "data/eval/results_r5_semantic_${lang}_before.json" \
    >"$OUT/eval_${lang}_before.log" 2>&1 \
    && note "eval ${lang} before ok" || note "eval ${lang} before FAILED"

  timeout 3600 python -m scripts.train_encoder --lang "$lang" \
    --epochs 40 \
    --pairs "data/eval/semantic_${lang}_train.jsonl" \
    --eval-pairs "data/eval/semantic_${lang}_held.jsonl" --save \
    >"$OUT/train_${lang}.log" 2>&1 \
    && note "train ${lang} ok (projection saved)" \
    || note "train ${lang}: no save (gate refused or error; see log)"

  timeout 2400 python -m scripts.evaluate_retrieval \
    --eval-file "data/eval/semantic_${lang}_held.jsonl" \
    --systems bm25,dense,fused \
    --out-json "data/eval/results_r5_semantic_${lang}_after.json" \
    >"$OUT/eval_${lang}_after.log" 2>&1 \
    && note "eval ${lang} after ok" || note "eval ${lang} after FAILED"
done

timeout 2400 python -m scripts.evaluate_retrieval \
  --eval-file data/eval/law_qa_hard.jsonl \
  --out-json data/eval/results_r2_hard50.json \
  >"$OUT/eval_hard50.log" 2>&1 \
  && note "hard50 ok" || note "hard50 FAILED"

timeout 2400 python -m scripts.evaluate_generation --schema 8 \
  --local-jax-layers 2 \
  --out-json data/eval/generation_smoke.json \
  >"$OUT/gen_smoke.log" 2>&1 \
  && note "generation smoke ok" || note "generation smoke FAILED"

timeout 900 python -m scripts.regen_claims >"$OUT/claims.log" 2>&1 \
  && note "claims ok" || note "claims FAILED"

note "cpu round5 done"
