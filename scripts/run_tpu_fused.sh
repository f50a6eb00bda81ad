#!/bin/bash
# Post-overhaul TPU bench sequence (fused decrypt-and-score + async D2H +
# host code pass-through).  Serialized, with inter-run pauses: device
# claims made right after a previous process exits can take minutes, and a
# killed claim wedges the grant (CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
mkdir -p bench_results

# 1. headline (hard 1M, scan parity default, batch 64, Q=256)
python bench.py > bench_results/bench_r3_fused_default.json \
    2> bench_results/bench_r3_fused_default.log
sleep 120

# 2. sustained 1024-query stream at the same point
BENCH_Q=1024 python bench.py > bench_results/bench_r3_fused_sustained.json \
    2> bench_results/bench_r3_fused_sustained.log
sleep 120

# 3. 10M x 96-d on one chip (auto-chunked scan; fused decrypt)
BENCH_N=10000000 BENCH_D=96 BENCH_Q=256 \
    python bench.py > bench_results/bench_r3_fused_10m.json \
    2> bench_results/bench_r3_fused_10m.log
echo DONE
