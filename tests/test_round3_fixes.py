"""Round-3 hardening regressions: scan-retry semantics, rotation pinning,
checkpoint validation, tracker contracts, approx-rerank sentinel, kadaptive.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fspann_tpu.api.system import ForwardSecureANNSystem
from fspann_tpu.config import (KAdaptiveConfig, SystemConfig, PaperConfig,
                               RuntimeConfig, EvalConfig)
from fspann_tpu.crypto.rotation import ReencryptionTracker, RotationRefused
from fspann_tpu.io import groundtruth
from fspann_tpu.ops import coding, partition, routing

DIM = 16
N = 1200


def scan_cfg(**runtime_kw):
    kw = dict(refinement_limit=400, max_global_candidates=400,
              block_size=32, routing_mode="scan")
    kw.update(runtime_kw)
    return SystemConfig(
        paper=PaperConfig(m=8, lam=2, divisions=2, tables=3, seed=13),
        runtime=RuntimeConfig(**kw),
        eval=EvalConfig(k_variants=(1, 10)),
    ).validate()


@pytest.fixture
def corpus(rng):
    centers = rng.normal(size=(16, DIM)).astype(np.float32) * 5
    base = centers[rng.integers(0, 16, N)] + \
        rng.normal(size=(N, DIM)).astype(np.float32)
    queries = centers[rng.integers(0, 16, 8)] + \
        rng.normal(size=(8, DIM)).astype(np.float32)
    return base, queries


class RouteRecorder:
    """Wraps index.route_batch, recording (probes, refinement_limit)."""

    def __init__(self, index):
        self.index = index
        self.calls = []
        self._orig = index.route_batch
        index.route_batch = self._wrapped

    def _wrapped(self, qc, qk, probes=None, refinement_limit=None):
        self.calls.append((probes, refinement_limit))
        return self._orig(qc, qk, probes, refinement_limit)


def test_scan_retry_widens_decrypt_budget(tmp_path, corpus):
    """An underfilled scan query must NOT re-pay an identical scan: the
    retry widens L (the decrypt budget) instead of probes (VERDICT r2
    weak 2; reference needRetry semantics adapted to scan mode)."""
    base, queries = corpus
    sys_ = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / "s"), DIM,
                                  query_batch=8)
    try:
        sys_.index_stream(base, batch_size=600)
        sys_.finalize_for_search()
        # store-side deletion only (routing stays alive): the scan returns
        # L ids but most fail decrypt — the canonical underfill that the
        # adaptive retry exists for
        sys_.store.delete(np.arange(40, N))
        rec = RouteRecorder(sys_.index)
        toks = [sys_.create_token(q, 10) for q in queries[:4]]
        res = sys_.query_service.search_batch(toks)
        assert len(rec.calls) == 2, "expected first pass + ONE retry"
        first, retry = rec.calls
        eff = sys_.cfg.runtime.effective_refinement()
        assert first[1] is None           # index default (effective L)
        assert retry[1] == 2 * eff        # widened L, not identical scan
        assert all(s.retried for s in res.stats)
    finally:
        sys_.shutdown()


def test_scan_retry_skipped_when_budget_covers_corpus(tmp_path, corpus):
    """When L already covers every live row, a wider scan cannot exist —
    the retry must be skipped entirely (no duplicated scan+decrypt)."""
    base, queries = corpus
    cfg = scan_cfg(refinement_limit=4096, max_global_candidates=4096)
    sys_ = ForwardSecureANNSystem(cfg, str(tmp_path / "s2"), DIM,
                                  query_batch=8)
    try:
        sys_.index_stream(base, batch_size=600)
        sys_.finalize_for_search()
        sys_.delete(np.arange(5, N))      # underfilled for sure (5 live)
        rec = RouteRecorder(sys_.index)
        toks = [sys_.create_token(q, 10) for q in queries[:4]]
        res = sys_.query_service.search_batch(toks)
        assert len(rec.calls) == 1, "retry must be skipped when L >= corpus"
        assert not any(s.retried for s in res.stats)
    finally:
        sys_.shutdown()


def test_tracker_drain_sorted_single_part():
    t = ReencryptionTracker()
    t.record(np.array([9, 3, 7, 3], np.int64))   # unsorted + dup, one part
    assert t.unique_count() == 3
    assert t.drain() == [3, 7, 9]                # sorted contract holds
    assert t.drain() == []


def test_force_rotate_refused_when_pinned(tmp_path, corpus):
    base, _ = corpus
    sys_ = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / "r"), DIM)
    try:
        sys_.index_stream(base[:200], batch_size=200)
        sys_.finalize_for_search()
        sys_.rotation.activate_version(sys_.km.current_version)
        with pytest.raises(RotationRefused):
            sys_.rotation.force_rotate_now()
        rep = sys_.run_selective_reencryption()
        assert rep.get("skipped") is True
    finally:
        sys_.shutdown()


def test_multidim_pinned_refuses_global_rotation(tmp_path, corpus):
    from fspann_tpu.api.multidim import MultiDimSystem

    base, _ = corpus
    md = MultiDimSystem(scan_cfg(), str(tmp_path / "md"))
    try:
        md.batch_insert(np.arange(200), base[:200])
        md.finalize_for_search()
        v0 = md.km.current_version
        md.system_for(DIM).rotation.activate_version(v0)
        rep = md.run_selective_reencryption()
        assert rep.get("skipped") is True
        assert md.km.current_version == v0, \
            "pinned multi-dim system was rotated out from under its pin"
    finally:
        md.shutdown()


def test_load_table_rejects_mismatched_point_codes(tmp_path, corpus):
    """A truncated/mismatched point_codes checkpoint must take the
    decrypt-and-rebuild path, not build a scan state whose leading dim
    disagrees with the tombstone mask (ADVICE r2)."""
    base, queries = corpus
    sys_ = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / "t"), DIM)
    try:
        sys_.index_stream(base, batch_size=600)
        sys_.finalize_for_search()
        path = str(tmp_path / "t" / "table.npz")
        z = dict(np.load(path))
        z["point_codes"] = z["point_codes"][: N // 2]   # truncate
        np.savez(path.removesuffix(".npz"), **z)

        fresh = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / "t"), DIM)
        try:
            assert not fresh.index.load_table(path, expect_rows=N)
            # full restore falls back to decrypt-and-rebuild and still works
            n = fresh.restore_index_from_disk()
            assert n == N
            tok = fresh.create_token(queries[0], 5)
            assert len(fresh.search(tok)) == 5
        finally:
            fresh.shutdown()
    finally:
        sys_.shutdown()


def test_route_rerank_approx_pads_rank_last(rng):
    """approx=True must not let pad slots saturate to 'best possible'
    (ADVICE r2: INT32_MAX is not f32-exact) — pad scores come back _INF
    and live candidates outrank them."""
    n, d = 300, 24
    base = rng.normal(size=(n, d)).astype(np.float32) * 4
    bank = coding.build_bank_from_sample(base[:256], 10, 2, 2, 2, 3)
    codes, keys = coding.encode(jnp.asarray(base), bank)
    table = partition.build_partitions(jnp.transpose(keys, (1, 0)),
                                       jnp.transpose(codes, (1, 0, 2)), 16)
    queries = rng.normal(size=(4, d)).astype(np.float32) * 4
    qc, qk = coding.encode(jnp.asarray(queries), bank)
    # tombstone most of the corpus so the routed set is mostly pads
    tomb = np.ones(n, bool)
    tomb[:20] = False
    res = routing.route_rerank(table, qc, qk, jnp.asarray(tomb),
                               jnp.asarray(codes), 2, 64, approx=True)
    ids = np.asarray(res.ids)
    scores = np.asarray(res.scores)
    int32_max = np.iinfo(np.int32).max
    assert (scores[ids < 0] == int32_max).all()
    # live candidates (if any) must occupy the best-ranked slots, never
    # be preceded by a pad with a "better" (saturated) score
    for qi in range(ids.shape[0]):
        live = np.flatnonzero(ids[qi] >= 0)
        if len(live):
            assert live.max() == len(live) - 1, "pad ranked above live"


def test_kadaptive_widen(tmp_path, corpus):
    base, _ = corpus
    cfg = dataclasses.replace(
        scan_cfg(), kadaptive=KAdaptiveConfig(enabled=True, probe_factor=2.0,
                                              max_fanout=16))
    sys_ = ForwardSecureANNSystem(cfg, str(tmp_path / "ka"), DIM)
    try:
        old, new = sys_.kadaptive_widen()
        assert (old, new) == (5, 10)
        assert sys_.cfg.runtime.effective_probes() == 10
        assert sys_.query_service.cfg is sys_.cfg
        old, new = sys_.kadaptive_widen()
        assert (old, new) == (10, 16)     # capped at max_fanout
    finally:
        sys_.shutdown()


def test_kadaptive_disabled_noop(tmp_path):
    sys_ = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / "kd"), DIM)
    try:
        assert not sys_.kadaptive_probe_enabled()
        assert sys_.kadaptive_widen() == (5, 5)
        assert sys_.cfg.runtime.effective_probes() == 5
    finally:
        sys_.shutdown()


def test_decoy_interleaving_preserves_real_metrics(tmp_path, corpus):
    """VERDICT r2 missing 1: decoys must flow through the FULL pipeline
    while recall/ratio are computed on real queries only — and the decoy
    traffic must measurably dilute the touched-id set (the cloak)."""
    from fspann_tpu.query.decoy import DecoyGenerator

    base, queries = corpus
    gtm = groundtruth.precompute(base, queries, k=10)

    def build(name):
        s = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / name), DIM,
                                   query_batch=8)
        s.index_stream(base, batch_size=600)
        s.finalize_for_search()
        return s

    plain = build("plain")
    cloak = build("cloak")
    try:
        agg0 = plain.run_queries(queries, gtm, base)
        touched0 = plain.tracker.unique_count()

        gen = DecoyGenerator(DIM, rate=1.0, seed=7)
        mixed, src = gen.interleave(queries)
        assert (src >= 0).sum() == len(queries)
        agg1 = cloak.run_queries(mixed, gtm, base, real_src=src)
        touched1 = cloak.tracker.unique_count()

        # real-query metrics unchanged by the interleaved decoys
        assert agg1.num_queries == agg0.num_queries == len(queries)
        assert agg1.recall_at_k[10] == pytest.approx(agg0.recall_at_k[10])
        assert agg1.ratio_at_k[10] == pytest.approx(agg0.ratio_at_k[10])
        # decoys dilute the touched set (more unique ids decrypted)
        assert touched1 > touched0
        # diagnostics only saw real queries, with ORIGINAL indices
        assert cloak.diagnostics.total == len(queries)
        for e in cloak.diagnostics.samples:
            assert 0 <= e.query_index < len(queries)
    finally:
        plain.shutdown()
        cloak.shutdown()


def test_aggregates_from_profiler_matches_from_rows(tmp_path, corpus):
    from fspann_tpu.query.aggregates import Aggregates

    base, queries = corpus
    sys_ = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / "agg"), DIM,
                                  query_batch=8)
    try:
        sys_.index_stream(base, batch_size=600)
        sys_.finalize_for_search()
        gtm = groundtruth.precompute(base, queries, k=10)
        a_fast = sys_.run_queries(queries, gtm, base)
        a_rows = Aggregates.from_rows(sys_.profiler.rows)
        assert a_fast.num_queries == a_rows.num_queries
        assert a_fast.mean_art_ms == pytest.approx(a_rows.mean_art_ms)
        assert a_fast.p95_art_ms == pytest.approx(a_rows.p95_art_ms)
        for k in a_rows.recall_at_k:
            assert a_fast.recall_at_k[k] == pytest.approx(
                a_rows.recall_at_k[k])
            assert a_fast.ratio_at_k[k] == pytest.approx(
                a_rows.ratio_at_k[k])
        assert a_fast.retry_fraction == pytest.approx(a_rows.retry_fraction)
    finally:
        sys_.shutdown()


def test_scan_flat_budget_knob(tmp_path, corpus):
    """A tiny configured budget pushes the scan onto the chunked path; the
    result must be identical to the flat scan (exactness of the merge)."""
    base, queries = corpus
    sys_flat = ForwardSecureANNSystem(scan_cfg(), str(tmp_path / "f"), DIM)
    sys_ch = ForwardSecureANNSystem(scan_cfg(scan_flat_budget_mb=1),
                                    str(tmp_path / "c"), DIM)
    try:
        for s in (sys_flat, sys_ch):
            s.index_stream(base, batch_size=600)
            s.finalize_for_search()
        assert sys_ch.index._scan_flat_budget() == 1 << 20
        gtm = groundtruth.precompute(base, queries, k=10)
        a1 = sys_flat.run_queries(queries, gtm)
        a2 = sys_ch.run_queries(queries, gtm)
        assert a1.recall_at_k[10] == pytest.approx(a2.recall_at_k[10])
    finally:
        sys_flat.shutdown()
        sys_ch.shutdown()


def test_fspann_threads_batch_open_identical(tmp_path, rng, monkeypatch):
    """FSPANN_THREADS=2 (oversubscribed on this 1-core host) must be a pure
    parallelization of the C batch open: identical plaintexts, ok flags,
    and fused norms for a batch large enough (>=1024) to engage the
    pthread split (VERDICT r2 weak 8 — scaling itself needs a multi-core
    serving host; correctness of the split is what this host can check)."""
    from fspann_tpu.crypto.keys import KeyManager
    from fspann_tpu.store.point_store import PointStore

    n, d = 2000, 24
    km = KeyManager(str(tmp_path / "ks.blob"))
    store = PointStore(str(tmp_path / "st"), km, d)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store.insert_batch(np.arange(n), vecs)
    try:
        ids = rng.permutation(n)[:1500]
        monkeypatch.setenv("FSPANN_THREADS", "1")
        norms1 = np.zeros(len(ids), np.float32)
        v1, ok1 = store.load_decrypt_batch(ids, norms_out=norms1)
        monkeypatch.setenv("FSPANN_THREADS", "2")
        norms2 = np.zeros(len(ids), np.float32)
        v2, ok2 = store.load_decrypt_batch(ids, norms_out=norms2)
        assert ok1.all() and ok2.all()
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(norms1, norms2)
    finally:
        store.close()


def test_profiler_rows_external_clear_cannot_desync():
    """``profiler.rows`` returns a detached list: mutating it (the old
    ``rows.clear()`` idiom) must neither hide block-stored rows nor let
    'cleared' rows resurface after the cache invalidates."""
    from fspann_tpu.utils.profiler import ROW_FIELDS, Profiler

    p = Profiler()
    blk = {f: np.zeros(3) for f in ROW_FIELDS}
    blk["query_index"] = np.arange(3)
    p.record_block(**blk)
    assert len(p.rows) == 3
    p.rows.clear()           # external mutation of the returned list
    assert len(p.rows) == 3  # storage untouched
    p.clear_rows()           # the real API
    assert len(p.rows) == 0
    p.record_block(**blk)
    assert len(p.rows) == 3
