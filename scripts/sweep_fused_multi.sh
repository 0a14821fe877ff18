#!/bin/bash
# Round-4 multi-audio fused-step TPU sweep.
#
# Measures the grouped multi-audio fused kernel (SG self rows per phase,
# CG audios per cross phase, TC chunk width) against the XLA engine step
# at the engine's real greedy configs (pending write blocks, W=8), across
# batch sizes.  One invocation per row keeps HBM pressure bounded; the
# process-level compilation cache amortizes compiles across rows.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/sweep_fused_multi.log}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 900 env "$@" 2>&1 | grep -E "ms/step|maxdiff|HBM|oom|Error|error" | tee -a "$LOG"
}

# 0. Mosaic lowering + parity on device (grouped paths), cheap shapes
run python scripts/bench_fused_step.py --audios 2 --check --skip-xla --iters 10
run WHISPER_TPU_FUSED_SG=1 WHISPER_TPU_FUSED_CG=1 WHISPER_TPU_FUSED_TC=512 \
  python scripts/bench_fused_step.py --audios 2 --check --skip-xla --iters 10

# 1. XLA baselines (pending, the engine's b16 config)
run python scripts/bench_fused_step.py --audios 16 --pending --skip-fused --iters 30
run python scripts/bench_fused_step.py --audios 8 --pending --skip-fused --iters 30
run python scripts/bench_fused_step.py --audios 2 --pending --skip-fused --iters 30

# 2. Fused pending at A=16: group sweep
for cfg in "SG=8 CG=2 TC=0" "SG=16 CG=2 TC=0" "SG=4 CG=2 TC=0" \
           "SG=8 CG=4 TC=0" "SG=8 CG=1 TC=0" "SG=8 CG=2 TC=512"; do
  set -- $cfg
  run WHISPER_TPU_FUSED_${1%=*}=${1#*=} WHISPER_TPU_FUSED_${2%=*}=${2#*=} \
      WHISPER_TPU_FUSED_${3%=*}=${3#*=} \
      python scripts/bench_fused_step.py --audios 16 --pending --skip-xla --iters 30
done

# 3. Fused pending at A=8 / A=2 (best A=16 config's knobs default)
run python scripts/bench_fused_step.py --audios 8 --pending --skip-xla --iters 30
run python scripts/bench_fused_step.py --audios 2 --pending --skip-xla --iters 30

echo "sweep done" | tee -a "$LOG"
