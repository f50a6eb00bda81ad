"""Encrypted point store: versioned arenas + metadata log + batch crypto.

This layer is the reference's ``AesGcmCryptoService`` + ``RocksDBMetadataManager``
pair fused around batches: vectors are serialized as little-endian float32,
sealed with AES-256-GCM under AAD ``id:{id}|v:{kv}|d:{dim}`` (reference
crypto/AesGcmCryptoService.java:72-83), appended to the key version's arena,
then committed via the metadata log.  Candidate loading is the query hot
path: group by key version, one mmap gather per version, ONE batched
multi-key GCM open for the whole candidate set (reference decrypts one point
per JCE call — QueryServiceImpl.java:238-271).

Routing–ciphertext orthogonality: nothing in this module touches routing
state; re-encryption rewrites arena records and metadata only.
"""

from __future__ import annotations

import functools
import os
import secrets
import threading
import time
from dataclasses import dataclass

import numpy as np

from ..crypto import aesgcm
from ..crypto.keys import KeyManager
from ..types import aad_batch, aad_for
from .arena import ArenaReader, ArenaWriter, secure_delete_arena
from .metadata import MetadataLog

TAG_LEN = aesgcm.TAG_LEN


@dataclass
class ReencryptReport:
    """Reference common/ReencryptReport.java."""

    touched: int
    reencrypted: int
    skipped_current: int
    failed: int
    time_ms: float
    bytes_delta: int
    bytes_after: int


def _locked(method):
    """Serialize store operations (see PointStore._lock rationale)."""

    @functools.wraps(method)
    def wrapper(self, *args, **kwargs):
        with self._lock:
            return method(self, *args, **kwargs)
    return wrapper


class PointStore:
    def __init__(self, base_dir: str, key_manager: KeyManager, dim: int,
                 dtype: str = "f32"):
        if dtype not in ("f32", "f16"):
            raise ValueError(f"storage dtype must be f32|f16, got {dtype!r}")
        self.base_dir = base_dir
        self.km = key_manager
        self.dim = dim
        self.dtype = dtype
        self.itemsize = 4 if dtype == "f32" else 2
        self.np_dtype = "<f4" if dtype == "f32" else "<f2"
        self.points_dir = os.path.join(base_dir, "points")
        os.makedirs(self.points_dir, exist_ok=True)
        self.meta = MetadataLog(os.path.join(base_dir, "meta.log"))
        self._writers: dict[int, ArenaWriter] = {}
        self._readers: dict[int, ArenaReader] = {}
        self._dirty: set[int] = set()
        # Coarse store lock (reentrant): concurrent background re-encryption
        # updates the (key_version, arena_off) metadata pair non-atomically
        # with respect to candidate gathers — the reference serializes with
        # synchronized blocks (RocksDBMetadataManager.java:162,295,311,342)
        # and so do we.  Held per batch; contention cost is negligible.
        self._lock = threading.RLock()

    # -- plumbing --------------------------------------------------------------

    def _arena_path(self, kv: int) -> str:
        return os.path.join(self.points_dir, f"v{kv}.arena")

    def _writer(self, kv: int) -> ArenaWriter:
        w = self._writers.get(kv)
        if w is None:
            w = ArenaWriter(self._arena_path(kv))
            self._writers[kv] = w
        return w

    def _reader(self, kv: int) -> ArenaReader:
        if kv in self._dirty:
            self._writers[kv].flush()
            self._dirty.discard(kv)
            r = self._readers.pop(kv, None)
            if r is not None:
                r.close()
        r = self._readers.get(kv)
        path = self._arena_path(kv)
        if r is None or r.size != os.path.getsize(path):
            if r is not None:
                r.close()
            r = ArenaReader(path)
            self._readers[kv] = r
        return r

    @property
    def record_ct_len(self) -> int:
        return self.itemsize * self.dim + TAG_LEN

    def quantize(self, vecs: np.ndarray) -> np.ndarray:
        """Round-trip vectors through the storage dtype (so routing codes
        computed at build time match what restore will decode)."""
        if self.dtype == "f32":
            return np.asarray(vecs, np.float32)
        return np.asarray(vecs, np.float32).astype("<f2").astype(np.float32)

    # -- writes ----------------------------------------------------------------

    @_locked
    def insert_batch(self, ids: np.ndarray, vecs: np.ndarray,
                     key_version: int | None = None) -> None:
        """Encrypt + persist a batch under one key version (default: current).

        Write order is arena-append → arena fsync → metadata append → fsync:
        the metadata record is the commit point (reference's crash-consistent
        protocol, RocksDBMetadataManager.java:342-375, restructured for
        batches).
        """
        kv = self.km.current_version if key_version is None else key_version
        ids = np.asarray(ids)
        vecs = np.asarray(vecs, np.float32)
        n = len(ids)
        if vecs.shape != (n, self.dim):
            raise ValueError(f"expected vecs [{n}, {self.dim}], got {vecs.shape}")

        body = self.itemsize * self.dim
        pt = np.frombuffer(vecs.astype(self.np_dtype).tobytes(),
                           np.uint8).copy()
        lens = np.full(n, body, np.uint64)
        offs = np.arange(n, dtype=np.uint64) * body
        ivs = np.frombuffer(secrets.token_bytes(12 * n), np.uint8
                            ).reshape(n, 12).copy()
        aads = aad_batch(ids, kv, self.dim)
        ct, tags = aesgcm.seal_batch(self.km.gcm_for(kv), ivs, aads, pt, offs,
                                     lens)

        w = self._writer(kv)
        clen = body
        ct_tag = np.concatenate([ct.reshape(n, clen), tags], axis=1)
        arena_offs = w.append_batch(ids, kv, self.dim, ivs, ct_tag)
        w.flush()
        self._dirty.add(kv)
        self.meta.put_batch(ids, kv, self.dim, arena_offs)
        self.meta.flush()

    @_locked
    def delete(self, ids) -> None:
        for pid in np.atleast_1d(np.asarray(ids)):
            self.meta.tombstone(int(pid))
        self.meta.flush()

    @_locked
    def undelete(self, ids) -> None:
        """Clear tombstones (the ciphertext was never removed — deletion
        is logical until the arena compacts/retires)."""
        for pid in np.atleast_1d(np.asarray(ids)):
            self.meta.undelete(int(pid))
        self.meta.flush()

    # -- reads -----------------------------------------------------------------

    @_locked
    def load_decrypt_batch(self, ids: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
        """Load + decrypt candidates.  ids int [n]; pad/missing/tombstoned
        entries yield ok=False.  Returns (vecs f32 [n, dim], ok bool [n]).

        Fully vectorized: one metadata gather, one mmap gather per live key
        version, ONE multi-key GCM open for the whole set (per-record key
        versions — reference QueryServiceImpl.java:250-251)."""
        ids = np.asarray(ids, np.int64)
        n = len(ids)
        vecs = np.zeros((n, self.dim), np.float32)
        ok = np.zeros(n, bool)

        kv_all, off_all = self.meta.lookup_batch(ids)
        present = kv_all > 0
        if not present.any():
            return vecs, ok
        versions = np.unique(kv_all[present])

        # Zero-copy decrypt: AES reads IV/ct/tag in place from each version's
        # mmap'd arena and scatter-writes plaintext rows straight into the
        # output matrix — no gather copies (this host is DRAM-bandwidth
        # bound, so every avoided pass over the candidate set is ~linear
        # speedup).
        body = self.itemsize * self.dim
        iv_rel = 20            # arena record: 20-byte header, then iv
        ct_rel = 32
        tag_rel = 32 + body
        if self.dtype == "f32":
            staging = vecs.reshape(-1).view(np.uint8)
        else:
            staging = np.zeros(n * body, np.uint8)
        for kv in versions:
            sel = np.flatnonzero(kv_all == kv)
            # visit records in arena-offset order: sequential-ish reads
            # prefetch far better than score-ordered random access (output
            # positions are scatter-written, so ordering is free)
            sel = sel[np.argsort(off_all[sel], kind="stable")]
            reader = self._reader(int(kv))
            aads = aad_batch(ids[sel], int(kv), self.dim)
            ok_v = aesgcm.open_batch_records(
                [self.km.gcm_for(int(kv))],
                np.zeros(len(sel), np.uint32),
                reader._buf, off_all[sel].astype(np.uint64),
                iv_rel, ct_rel, tag_rel, body,
                aads, staging, (sel * body).astype(np.uint64))
            ok[sel] = ok_v.astype(bool)
        if self.dtype != "f32":
            with np.errstate(all="ignore"):
                vecs[:] = staging.view("<f2").reshape(n, self.dim)
        return vecs, ok

    def key_version_of(self, pid: int) -> int | None:
        m = self.meta.get(int(pid))
        return None if m is None else m.key_version

    # -- re-encryption -----------------------------------------------------------

    @_locked
    def reencrypt_ids(self, ids, target_version: int | None = None
                      ) -> ReencryptReport:
        """Selective re-encryption: migrate the given ids to target_version
        (default current), skipping already-current points (reference
        KeyRotationServiceImpl.reencryptTouched:215-289)."""
        t0 = time.perf_counter()
        kv_target = (self.km.current_version if target_version is None
                     else target_version)
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        before = self.size_bytes()
        kv_all, _ = self.meta.lookup_batch(ids)
        todo = ids[(kv_all > 0) & (kv_all < kv_target)]
        skipped = int((kv_all >= kv_target).sum())
        failed = 0
        if len(todo):
            vecs, ok = self.load_decrypt_batch(todo)
            good = np.flatnonzero(ok)
            failed = len(todo) - len(good)
            if len(good):
                self.insert_batch(todo[good], vecs[good], kv_target)
        after = self.size_bytes()
        return ReencryptReport(
            touched=len(ids), reencrypted=len(todo) - failed,
            skipped_current=skipped, failed=failed,
            time_ms=(time.perf_counter() - t0) * 1e3,
            bytes_delta=after - before, bytes_after=after)

    def reencrypt_all(self, target_version: int | None = None
                      ) -> ReencryptReport:
        """Full migration sweep (reference reEncryptAll:98-146)."""
        return self.reencrypt_ids(self.meta.live_ids(), target_version)

    # -- maintenance --------------------------------------------------------------

    @_locked
    def retire_version(self, kv: int) -> bool:
        """Securely delete an arena whose version no longer owns live points."""
        if self.meta.count_with_version(kv) > 0:
            return False
        r = self._readers.pop(kv, None)
        if r is not None:
            r.close()
        w = self._writers.pop(kv, None)
        if w is not None:
            w.close()
        secure_delete_arena(self._arena_path(kv))
        return True

    @_locked
    def audit_drift(self) -> dict:
        """Set-diff metadata ids vs arena records (reference auditDrift:649-689).

        ``meta_without_arena``: live metadata whose current-version arena
        record is missing/corrupt (data loss).  ``arena_garbage``: arena
        records no live metadata points at (superseded by re-encryption or
        tombstoned — reclaimable via compact_version)."""
        meta_ids = set(self.meta.live_ids().tolist())
        backed = set()
        garbage = 0
        for name in os.listdir(self.points_dir):
            if not name.endswith(".arena"):
                continue
            kv = int(name[1:-len(".arena")])
            for off, pid, rkv, _dim, _iv, _ct in self._reader(kv).scan():
                m = self.meta.get(pid)
                if (m is not None and m.key_version == rkv
                        and m.arena_off == off):
                    backed.add(pid)
                else:
                    garbage += 1
        return {"meta_without_arena": sorted(meta_ids - backed),
                "arena_garbage_records": garbage,
                "meta_count": len(meta_ids)}

    @_locked
    def compact_version(self, kv: int) -> int:
        """Rewrite one live version's arena keeping only records current
        metadata points at (the reference queues superseded per-point files
        for deferred cleanup, RocksDBMetadataManager.java:430-498; with
        arenas, reclamation is a sequential rewrite).  Returns bytes freed."""
        path = self._arena_path(kv)
        if not os.path.exists(path):
            return 0
        reader = self._reader(kv)
        before = reader.size
        tmp_path = path + ".compact"
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
        w = ArenaWriter(tmp_path)
        moves: list[tuple[int, int]] = []
        for off, pid, rkv, dim, iv, ct in reader.scan():
            m = self.meta.get(pid)
            if m is not None and m.key_version == rkv and m.arena_off == off:
                new_off, _ = w.append(pid, rkv, dim, iv, ct)
                moves.append((pid, new_off))
        w.close()
        # swap in the compacted arena, then commit the new offsets
        r = self._readers.pop(kv, None)
        if r is not None:
            r.close()
        wr = self._writers.pop(kv, None)
        if wr is not None:
            wr.close()
        os.replace(tmp_path, path)
        for pid, new_off in moves:
            m = self.meta.get(pid)
            self.meta.put(pid, kv, m.dim, new_off)
        self.meta.flush()
        return before - os.path.getsize(path)

    def restore_iter(self, batch: int = 4096):
        """Yield (ids int64 [b], vecs f32 [b, dim]) decrypting every live
        point — the index-rebuild path (reference restoreIndexFromDisk:926-948)."""
        live = np.sort(self.meta.live_ids().astype(np.int64))
        for s in range(0, len(live), batch):
            chunk = live[s:s + batch]
            vecs, ok = self.load_decrypt_batch(chunk)
            yield chunk[ok], vecs[ok]

    def size_bytes(self) -> int:
        total = 0
        for name in os.listdir(self.points_dir):
            total += os.path.getsize(os.path.join(self.points_dir, name))
        return total

    @_locked
    def flush(self) -> None:
        for kv, w in self._writers.items():
            w.flush()
        self.meta.flush()

    def close(self) -> None:
        self.flush()
        for r in self._readers.values():
            r.close()
        for w in self._writers.values():
            w.close()
        self.meta.close()
