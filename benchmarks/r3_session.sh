#!/bin/bash
# Round-3 TPU sweep: finer edge tiles for the split causal fwd (the ebq/ebk
# sweep that OOM'd in round 2) + wider bwd split tiles now that the
# scoped-VMEM limits are modeled. One process at a time; appends to
# benchmarks/r3_session.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=benchmarks/r3_session.log

run() {
  local t=$1; shift
  local name=$1; shift
  echo "=== $name [$(date +%H:%M:%S)] ===" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
}

phase=${1:-all}

if [ "$phase" = "fwde" ] || [ "$phase" = "all" ]; then
  run 600 "fwds e512x512"  python benchmarks/r2_kernel_bench.py fwds 1024 1024 512 512
  run 600 "fwds e256x256"  python benchmarks/r2_kernel_bench.py fwds 1024 1024 256 256
  run 600 "fwds e1024x512" python benchmarks/r2_kernel_bench.py fwds 1024 1024 1024 512
  run 600 "fwds e1024x256" python benchmarks/r2_kernel_bench.py fwds 1024 1024 1024 256
  run 600 "fwds e512x256"  python benchmarks/r2_kernel_bench.py fwds 1024 1024 512 256
fi

if [ "$phase" = "bwdt" ] || [ "$phase" = "all" ]; then
  run 600 "bwds 1024 256"  python benchmarks/r2_kernel_bench.py bwds 1024 256
  run 600 "bwds 2048 1024" python benchmarks/r2_kernel_bench.py bwds 2048 1024
  run 600 "bwds 2048 2048" python benchmarks/r2_kernel_bench.py bwds 2048 2048
fi

echo "=== sweep done [$(date +%H:%M:%S)] ===" >> "$LOG"
