"""Streaming Pallas top-k kernel vs the XLA brute-force oracle (interpret
mode on CPU; the real lowering is exercised on TPU by bench/GT paths)."""

import numpy as np
import pytest

from fspann_tpu.ops import refine
from fspann_tpu.ops.pallas_scan import streaming_topk


@pytest.mark.parametrize("n,d,q,k", [(500, 16, 5, 10), (2048, 24, 3, 100)])
def test_streaming_topk_matches_bruteforce(rng, n, d, q, k):
    base = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    ids, dist = streaming_topk(base, queries, k, tile_n=256, q_tile=8,
                               interpret=True)
    gt_ids, gt_dist = refine.bruteforce_topk(base, queries, k)
    np.testing.assert_allclose(dist, gt_dist, rtol=2e-4, atol=1e-4)
    for i in range(q):
        # id sets equal modulo exact distance ties
        d_true = np.linalg.norm(base[ids[i]] - queries[i], axis=1)
        np.testing.assert_allclose(np.sort(d_true), np.sort(gt_dist[i]),
                                   rtol=2e-4, atol=1e-4)


def test_streaming_topk_padding(rng):
    """N not a multiple of the tile: padded rows never surface."""
    base = rng.normal(size=(300, 12)).astype(np.float32)
    queries = base[:3]
    ids, dist = streaming_topk(base, queries, 5, tile_n=256, q_tile=8,
                               interpret=True)
    assert (ids < 300).all() and (ids >= 0).all()
    assert (ids[:, 0] == np.arange(3)).all()
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-3)
