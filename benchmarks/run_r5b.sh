#!/bin/bash
# Round-5 continuation after the perm-stage row-tiling fix: the 2^20
# flagship first (VERDICT #1), then the remaining queue.
set -u
cd "$(dirname "$0")/.."
LOGDIR=${VALIDA_TPU_BENCH_LOGDIR:-bench_logs}
mkdir -p "$LOGDIR"
export VALIDA_TPU_WARMUP_LOG=1

run() {
  local name=$1 tmo=$2; shift 2
  local log="$LOGDIR/$name.log"
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date -u +%FT%TZ) ===" >> "$log"
    timeout "$tmo" "$@" >> "$log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
      echo "=== $name OK $(date -u +%FT%TZ) ===" >> "$log"
      return 0
    fi
    echo "=== $name attempt $attempt FAILED rc=$rc ===" >> "$log"
    sleep 20
  done
  echo "=== $name GAVE UP ===" >> "$log"
  return 1
}

run big20 12600 python benchmarks/big_trace.py 20 jax 40 4
run fib25 7200  python benchmarks/sweep.py fib_prove_jax
VALIDA_TPU_SWEEP_ROW_TILE=$((1 << 21)) \
  run sweep24k 7200 python benchmarks/sweep.py lde_merkle_streamed 22,24 keccak
VALIDA_TPU_SWEEP_ROW_TILE=$((1 << 20)) \
  run sweep24p 7200 python benchmarks/sweep.py lde_merkle_streamed 22,24 poseidon2
run roofline 3600 python benchmarks/roofline.py --hash-sizes 20,22
echo "ALL DONE $(date -u +%FT%TZ)"
