#!/bin/bash
# Round-5 flagship device measurements (VERDICT r4 #1/#2), serialized on
# the single tunneled TPU chip.  Each phase retries: the axon
# remote-compile service has dropped connections mid-warmup before
# (BENCH_WORKLOADS r4), and a retry resumes from the persistent
# exported-stage + XLA caches.
#
# Run from a SNAPSHOT worktree so concurrent source edits in the main
# checkout cannot shift the source fingerprint mid-run.
set -u
cd "$(dirname "$0")/.."
LOGDIR=${VALIDA_TPU_BENCH_LOGDIR:-bench_logs}
mkdir -p "$LOGDIR"
export VALIDA_TPU_WARMUP_LOG=1

run() {
  local name=$1 tmo=$2; shift 2
  local log="$LOGDIR/$name.log"
  for attempt in 1 2 3; do
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

# 2^13 first: device canary (validates the round-5 prover incl. the
# device challenger on real hardware in ~20 min) + the VERDICT #2 target
run big13 3600  python benchmarks/big_trace.py 13 jax 40 0
# the flagship rows (VERDICT #1, three rounds outstanding)
run big17 9000  python benchmarks/big_trace.py 17 jax 40 0
run big20 12600 python benchmarks/big_trace.py 20 jax 40 4
# reference-parity headline
run fib25 7200  python benchmarks/sweep.py fib_prove_jax
# BASELINE config #4: LDE+Merkle sweep 2^22..2^24 through the streamed
# per-coset commit (row-tiled hash, VERDICT #3)
VALIDA_TPU_SWEEP_ROW_TILE=$((1 << 21)) \
  run sweep24k 7200 python benchmarks/sweep.py lde_merkle_streamed 22,24 keccak
VALIDA_TPU_SWEEP_ROW_TILE=$((1 << 20)) \
  run sweep24p 7200 python benchmarks/sweep.py lde_merkle_streamed 22,24 poseidon2
# hash-kernel rooflines (VERDICT #7)
run roofline 3600 python benchmarks/roofline.py --hash-sizes 20,22
echo "ALL DONE $(date -u +%FT%TZ)"
