"""Pure-numpy oracle implementations of the reference algorithms.

These re-implement, independently of the device code, the semantics of
reference Coding.java / GreedyPartitioner.java / PartitionedIndexService.java
so that the JAX kernels can be checked bit-for-bit on small inputs.
"""

from __future__ import annotations

import numpy as np


def oracle_h(x: np.ndarray, alpha: np.ndarray, r: np.ndarray,
             omega: np.ndarray) -> np.ndarray:
    """H per group: int32 [N, G, m] (Coding.H:250-258)."""
    y = np.einsum("nd,gmd->ngm", x.astype(np.float64), alpha.astype(np.float64))
    return np.floor((y + r) / omega).astype(np.int64).astype(np.int32)


def oracle_code_bits(h: np.ndarray, m: int, lam: int) -> np.ndarray:
    """Interleaved bit array [..., m*lam]; position l*m+j = bit lam-1-l of h_j
    (Coding.C:285-301, MSB-first)."""
    out = np.zeros(h.shape[:-1] + (m * lam,), np.uint8)
    for l in range(lam):
        i = lam - 1 - l
        out[..., l * m:(l + 1) * m] = (h >> i) & 1
    return out


def oracle_pack(bits: np.ndarray) -> np.ndarray:
    """Pack bit array into uint32 words, bit p -> word p//32 bit 31-p%32."""
    nbits = bits.shape[-1]
    w = (nbits + 31) // 32
    padded = np.zeros(bits.shape[:-1] + (w * 32,), np.uint8)
    padded[..., :nbits] = bits
    padded = padded.reshape(bits.shape[:-1] + (w, 32))
    weights = (np.uint64(1) << (31 - np.arange(32, dtype=np.uint64)))
    return (padded.astype(np.uint64) * weights).sum(-1).astype(np.uint32)


def oracle_key(bits: np.ndarray) -> np.ndarray:
    """63-bit sortable key: bit p -> key bit 62-p (GreedyPartitioner:87-96)."""
    nbits = min(63, bits.shape[-1])
    key = np.zeros(bits.shape[:-1], np.int64)
    for p in range(nbits):
        key |= bits[..., p].astype(np.int64) << (62 - p)
    return key


def oracle_partitions(keys: np.ndarray, ids: np.ndarray, block: int):
    """Reference GreedyPartitioner.build for one group: list of dicts."""
    order = np.lexsort((ids, keys))  # stable by key then id (ids unique)
    sk, si = keys[order], ids[order]
    parts = []
    for s in range(0, len(sk), block):
        e = min(s + block, len(sk))
        mid = s + ((e - s - 1) >> 1)
        parts.append(dict(min=sk[s], max=sk[e - 1], rep_id=si[mid],
                          ids=list(si[s:e])))
    return parts


def oracle_find_nearest(parts, qkey: int) -> int:
    """GreedyPartitioner.findNearestPartition:101-124."""
    lo, hi = 0, len(parts) - 1
    while lo <= hi:
        mid = (lo + hi) >> 1
        p = parts[mid]
        if qkey < p["min"]:
            hi = mid - 1
        elif qkey > p["max"]:
            lo = mid + 1
        else:
            return mid
    if lo <= 0:
        return 0
    if lo >= len(parts):
        return len(parts) - 1
    dl = max(parts[lo - 1]["min"] - qkey, qkey - parts[lo - 1]["max"], 0)
    dr = max(parts[lo]["min"] - qkey, qkey - parts[lo]["max"], 0)
    return lo - 1 if dl <= dr else lo


def hamming_bits(a: np.ndarray, b: np.ndarray) -> int:
    return int((a != b).sum())


def oracle_probe_group(parts, rep_bits, qbits, qkey, max_probes,
                       deleted=frozenset()):
    """Contiguous greedy-walk equivalent of the reference's best-first probe.

    rep_bits: [P, nbits] representative code bit arrays.
    Returns {id: score} for this group.
    """
    if not parts:
        return {}
    p = len(parts)
    center = oracle_find_nearest(parts, qkey)
    ham = [hamming_bits(qbits, rep_bits[i]) for i in range(p)]
    lo = hi = center
    for _ in range(max_probes - 1):
        hl = ham[lo - 1] if lo - 1 >= 0 else None
        hr = ham[hi + 1] if hi + 1 < p else None
        if hl is None and hr is None:
            break
        if hr is None or (hl is not None and hl <= hr):
            lo -= 1
        else:
            hi += 1
    best = {}
    for i in range(lo, hi + 1):
        for pid in parts[i]["ids"]:
            if pid in deleted:
                continue
            if pid not in best or ham[i] < best[pid]:
                best[pid] = ham[i]
    return best


def oracle_route(group_parts, group_rep_bits, qbits_per_group, qkeys,
                 max_probes, limit, deleted=frozenset()):
    """Full stage A across groups: dedupe min-score, rank by (score, id)."""
    best = {}
    for g, parts in enumerate(group_parts):
        scores = oracle_probe_group(parts, group_rep_bits[g],
                                    qbits_per_group[g], qkeys[g],
                                    max_probes, deleted)
        for pid, s in scores.items():
            if pid not in best or s < best[pid]:
                best[pid] = s
    ranked = sorted(best.items(), key=lambda kv: (kv[1], kv[0]))[:limit]
    return ranked
