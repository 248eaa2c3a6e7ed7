#!/bin/bash
# CI entry points (the reference curates its CI the same way,
# tools/ci/run_fa4_ci.py). Run from the repo root.
set -e
case "${1:-smoke}" in
  smoke)   # every kernel family + subsystem, ~6 min on 4 cores
    python -m pytest tests/ -q -m "not slow" -n 4 ;;
  full)    # + breadth sweeps and heavy scenarios, ~9-11 min
    python -m pytest tests/ -q -n 4 ;;
  bench)   # one JSON line of hardware numbers (real TPU required)
    python bench.py ;;
  engine-smoke)  # continuous-batching engine AT THE BENCH SHAPE on the
    # real chip — hard-fails on any shape-level error (OOM etc.), the
    # round-4 failure class that bench.py's best-effort handlers swallow
    python -c "import bench; r = bench.bench_engine(n_requests=24); print('engine smoke ok:', r)" ;;
  multichip)  # 8-virtual-device sharding dryrun (CPU)
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('ok')" ;;
  *) echo "usage: tools/ci.sh [smoke|full|bench|multichip]"; exit 2 ;;
esac
