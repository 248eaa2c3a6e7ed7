#!/bin/bash
# One-shot TPU measurement session for the round-2 kernel candidates.
# Runs each step as its own process (one TPU client at a time), generous
# timeouts (remote Mosaic compiles are minutes each, cached afterwards in
# .jax_cache). Appends everything to benchmarks/r2_session.log.
#
# Usage: bash benchmarks/r2_session.sh [phase]
#   phase: all | probe | paired | split | sweep | bench | serving
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=benchmarks/r2_session.log
phase="${1:-all}"

run() {  # run <timeout-s> <label> <cmd...>
  local t="$1" label="$2"; shift 2
  echo "=== $label [$(date +%H:%M:%S)] ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo "--- rc=$? ---" | tee -a "$LOG"
}

if [[ "$phase" == all || "$phase" == probe ]]; then
  run 1200 "mxu_vpu_overlap_probe" python benchmarks/mxu_vpu_overlap_probe.py
fi

if [[ "$phase" == all || "$phase" == paired ]]; then
  run 900 "fwd paired non-causal" python benchmarks/r2_kernel_bench.py fwdpnc
  run 900 "fwd paired causal"     python benchmarks/r2_kernel_bench.py fwdp
  run 900 "bwd paired causal"     python benchmarks/r2_kernel_bench.py bwdp
fi

if [[ "$phase" == all || "$phase" == split ]]; then
  run 900 "fwd split default"     python benchmarks/r2_kernel_bench.py fwds
  run 900 "bwd split default"     python benchmarks/r2_kernel_bench.py bwds
  run 900 "fwd split+paired"      python benchmarks/r2_kernel_bench.py fwdsp
  run 900 "bwd split+paired"      python benchmarks/r2_kernel_bench.py bwdsp
  run 900 "decode-attn serving"   python benchmarks/r2_kernel_bench.py dec
fi

if [[ "$phase" == sweep ]]; then
  # Tile sweeps for whichever candidate won (run selectively by hand).
  for bq in 256 512; do for bk in 256 512; do
    run 900 "fwds $bq $bk" python benchmarks/r2_kernel_bench.py fwds "$bq" "$bk"
  done; done
  for bq in 256 512; do for bk in 256 512; do
    run 900 "bwds $bq $bk" python benchmarks/r2_kernel_bench.py bwds "$bq" "$bk"
  done; done
fi

if [[ "$phase" == all || "$phase" == bench ]]; then
  # Warms .jax_cache for the driver's BENCH_r02 run.
  run 1800 "bench.py" env FA_BENCH_DEBUG=1 python bench.py
fi

if [[ "$phase" == serving ]]; then
  run 1800 "serving 1b b=128"     python benchmarks/serving_bench.py 1b 128 16
  run 1800 "serving 1b b=128 fp8" python benchmarks/serving_bench.py 1b 128 16 fp8
fi

echo "SESSION DONE $(date +%H:%M:%S)" | tee -a "$LOG"
