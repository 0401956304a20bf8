#!/bin/bash
# One-shot device-work queue for a live TPU tunnel window. Runs the round-3
# device backlog in priority order, logging each step to logs/device_r3/;
# every step is individually timeout-bounded so one hang doesn't eat the
# window. Usage:  bash scripts/device_session.sh   (from the repo root)
set -u
cd "$(dirname "$0")/.."
LOGS=logs/device_r3
mkdir -p "$LOGS"

run() { # run <minutes> <name> <cmd...>
  local mins=$1 name=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S), cap ${mins}m) ==="
  timeout "$((mins * 60))" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  tail -4 "$LOGS/$name.log"
  echo "=== $name rc=$rc ==="
}

# 0. tunnel sanity (fail the whole session fast if the backend is gone)
timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print(jax.devices())" \
  || { echo "TUNNEL DOWN — aborting"; exit 1; }

# 1. device-tier tests: real-Mosaic kernel parity (flash decode MHA/GQA/Q8,
#    int4 kernel, gated-bias) vs XLA oracles
run 30 tests_device python -m pytest tests/ -m device -q

# 2. decode decomposition: where the 314 GB/s -> roofline gap lives
run 25 profile_decode python scripts/profile_decode.py

# 3. prefill decomposition incl. conv_pos A/B (grouped/unrolled/im2col)
run 35 profile_prefill python scripts/profile_prefill.py

# 4. headline benches (flash-decode kernel now in the full step)
run 25 bench_7b python bench.py
run 30 bench_13b env BENCH_13B=1 BENCH_SKIP_7B=1 python bench.py
run 25 bench_qwen7b env BENCH_QWEN7B=1 BENCH_SKIP_7B=1 python bench.py
run 25 bench_qwen7b_speech env BENCH_QWEN7B_SPEECH=1 BENCH_SKIP_7B=1 python bench.py
run 30 bench_train7b env BENCH_TRAIN7B=1 BENCH_SKIP_7B=1 python bench.py

# 5. int8-KV decode variants (7B + 13B decode with the quantized cache)
run 30 bench_kv_int8 env BENCH_KV_INT8=1 BENCH_13B=1 python bench.py

# 6. serving with device-time accounting
run 30 bench_serving env BENCH_SERVING=1 BENCH_SKIP_7B=1 python bench.py

echo "ALL DONE $(date -u +%H:%M:%S) — logs in $LOGS/"
