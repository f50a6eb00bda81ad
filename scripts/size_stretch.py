#!/usr/bin/env python
"""Sizing model for the v5e-8 stretch configuration (BASELINE.json config 5:
100M × 768-d RAG corpus, distributed routing + cross-chip merge).

Grounded in round-2 MEASUREMENTS on one v5e chip (bench_results/):
  - MXU Hamming scan: 1M×1152 bits in 13.8 ms / 64-query batch (incl.
    top-L) => ~0.19 ms per 1e9 bit-MACs column-block; scales linearly in N
    (measured 10M: ~56 ms/batch at 864 bits).
  - host AES-GCM open: ~1.9 GB/s per core (VAES kernel), FSPANN_THREADS
    scales across cores.
  - ICI all_gather of L (id,score) pairs per shard: negligible (≤ 2 MB).

Usage: python scripts/size_stretch.py [N] [D] [chips]
"""
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 768
CHIPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

# default paper config at tables=8 (parity profile)
G, M, LAM = 8 * 3, 24, 2
B = G * M * LAM                     # code bits/point
Q, L = 64, 2000                     # query batch, decrypt budget
HBM_PER_CHIP = 16e9                 # v5e

rows = -(-N // CHIPS)
bits_bytes = rows * B               # int8 storage: 1 byte/bit
scan_ms = 13.8 * (rows / 1e6) * (B / 1152)   # measured 1M×1152 scaling
ct_bytes = N * (D * 4 + 46)         # record = payload + iv/tag/header
ici_mb = CHIPS * Q * L * 8 / 1e6
aes_ms_per_core = L * (D * 4 + 46) / 1.9e9 * 1e3  # per query

fits = "FITS (at 90% budget)" if bits_bytes <= HBM_PER_CHIP * 0.9 \
    else "OVER — use int4 packing or more chips"
print(f"stretch config: N={N:,} D={D} chips={CHIPS} "
      f"(code bits B={B}, L={L})")
print(f"  rows/chip:            {rows:,}")
print(f"  bit matrix/chip:      {bits_bytes/1e9:.2f} GB int8 — {fits} "
      f"of {HBM_PER_CHIP/1e9:.0f} GB HBM")
print(f"  scan compute/chip:    {scan_ms:.1f} ms / {Q}-query batch "
      f"({scan_ms/Q:.2f} ms/query)")
print(f"  ICI merge payload:    {ici_mb:.1f} MB / batch (all_gather)")
print(f"  ciphertext (hosts):   {ct_bytes/1e9:.0f} GB sharded arenas")
print(f"  AES decrypt/query:    {aes_ms_per_core:.1f} ms/core "
      f"(/= FSPANN_THREADS)")
print(f"  scan intermediates:   {rows * Q * 8 / 1e9:.2f} GB/chip at "
      f"Q={Q} (dots+rank, int32) — sub-batch queries (Q<=16) when "
      f"rows/chip >= 10M")
print(f"  int4 bit packing would halve HBM to "
      f"{bits_bytes / 2 / 1e9:.2f} GB/chip if needed "
      f"(int4 matmul not yet lowered by this jax build)")
