#!/bin/bash
# One-shot perf measurement matrix for when the TPU tunnel is reachable.
# Runs each candidate sequentially (single chip — never concurrently) and
# appends results to the log.  Usage:  bash tools/run_perf_matrix.sh [log]
#
# Stages:
#   1. Co=1 head-conv prototype: XLA vs tap-major opsA/opsD (fwd + fwd+grad)
#   2. Fused bench: default | PCRL_HEADCONV=tapA | tapD
#   3. Fused bench: BENCH_PRNG=rbg (aug random-bit generation)
#   4. Fused bench: XLA flag probes (scoped VMEM)
set -u
LOG="${1:-/tmp/perf_matrix.log}"
cd /root/repo
run() {  # run <label> <timeout_s> <cmd...>
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  shift
  local t=$1; shift
  timeout "$t" "$@" 2>&1 | tail -6 | tee -a "$LOG"
}

run proto_co1 1800 python tools/proto_co1_tapmajor.py xla,opsA,opsD,opsP
run bench_default 900 python bench.py
run bench_tapA 900 env PCRL_HEADCONV=tapA python bench.py
run bench_tapD 900 env PCRL_HEADCONV=tapD python bench.py
run bench_tapP 900 env PCRL_HEADCONV=tapP python bench.py
run bench_tapPx 900 env PCRL_HEADCONV=tapPx python bench.py
run bench_tapDx 900 env PCRL_HEADCONV=tapDx python bench.py
run bench_rbg 900 env BENCH_PRNG=rbg python bench.py
run bench_vmem64m 900 env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python bench.py
echo "=== matrix done ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
