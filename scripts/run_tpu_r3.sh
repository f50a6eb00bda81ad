#!/bin/bash
# Round-3 TPU bench sequence — run AFTER the CPU family sweep finishes
# (one TPU client at a time; host AES needs the core to itself).
set -x
cd "$(dirname "$0")/.."
mkdir -p bench_results

# 1. headline refresh (hard 1M, scan parity default)
python bench.py > bench_results/bench_r3_default.json \
    2> bench_results/bench_r3_default.log

# 2. sustained 1024-query stream (eval-loop vectorization check)
BENCH_Q=1024 python bench.py > bench_results/bench_r3_sustained.json \
    2> bench_results/bench_r3_sustained.log

# 3. per-family TPU scan rows (corpus+GT regenerate per family)
FAM_PROFILES=GIST_SCAN python scripts/run_families_r3.py gist \
    >> bench_results/families_r3_tpu.log 2>&1
FAM_PROFILES=GLOVE_SCAN python scripts/run_families_r3.py glove \
    >> bench_results/families_r3_tpu.log 2>&1
FAM_PROFILES=REDCAPS_SCAN python scripts/run_families_r3.py redcaps \
    >> bench_results/families_r3_tpu.log 2>&1
echo DONE
