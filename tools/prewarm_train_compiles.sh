#!/bin/bash
# Pre-warm the (server-side, HLO-keyed) compile cache for the batch-8/16
# train-step graphs (VERDICT r4 task 4). Each arm is retried until its JSON
# line lands: a killed run still advances the tunnel's server-side compile,
# so the next attempt hits a warmer cache (CLAUDE.md "re-run until it prints
# its JSON line").
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
OUT=/tmp/prewarm_train.log
: > "$OUT"
run_arm () {
  local label="$1"; shift
  for attempt in 1 2; do
    echo "=== $label attempt $attempt $(date +%T) ===" >> "$OUT"
    if timeout 3500 python tools/bench_train_step.py "$@" >> "$OUT" 2>&1; then
      echo "=== $label OK ===" >> "$OUT"
      return 0
    fi
    echo "=== $label attempt $attempt failed/timeout ===" >> "$OUT"
    sleep 5
  done
  echo "=== $label GAVE UP ===" >> "$OUT"
}
run_arm "b8"        --batch 8
run_arm "b8-remat"  --batch 8 --remat
run_arm "b16"       --batch 16
run_arm "b16-remat" --batch 16 --remat
# re-measure the b4 baseline in the same session for an apples-to-apples table
run_arm "b4"        --batch 4
echo "ALL DONE $(date +%T)" >> "$OUT"
