"""Bitonic streaming top-k kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest

from fspann_tpu.ops import refine
from fspann_tpu.ops.pallas_topk import bitonic_topk


@pytest.mark.parametrize("n,d,q,k", [(700, 16, 4, 10), (1024, 24, 3, 100)])
def test_bitonic_topk_matches_bruteforce(rng, n, d, q, k):
    base = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    ids, dist = bitonic_topk(base, queries, k, tile_n=256, q_tile=8,
                             interpret=True)
    gt_ids, gt_dist = refine.bruteforce_topk(base, queries, k)
    np.testing.assert_allclose(dist, gt_dist, rtol=2e-4, atol=1e-4)
    for i in range(q):
        d_true = np.linalg.norm(base[ids[i]] - queries[i], axis=1)
        np.testing.assert_allclose(np.sort(d_true), np.sort(gt_dist[i]),
                                   rtol=2e-4, atol=1e-4)


def test_bitonic_topk_exact_duplicates(rng):
    """Duplicate rows tie in distance; index tie-break must keep distinct
    ids rather than duplicating one."""
    base = np.concatenate([rng.normal(size=(50, 8)).astype(np.float32)] * 4)
    ids, dist = bitonic_topk(base, base[:3], 8, tile_n=256, q_tile=8,
                             interpret=True)
    for row in ids:
        assert len(set(row.tolist())) == len(row)
    # |b|^2-2qb+|q|^2 in f32 cancels to ~sqrt(eps)*|q| for exact matches
    np.testing.assert_allclose(dist[:, :4], 0.0, atol=5e-3)


def test_bitonic_topk_padding(rng):
    base = rng.normal(size=(300, 12)).astype(np.float32)
    ids, dist = bitonic_topk(base, base[:3], 5, tile_n=256, q_tile=8,
                             interpret=True)
    assert (ids < 300).all() and (ids >= 0).all()
    assert (ids[:, 0] == np.arange(3)).all()
