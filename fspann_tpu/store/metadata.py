"""Append-only metadata log: the commit point of the store.

Functional counterpart of the reference's RocksDB metadata manager
(``common/RocksDBMetadataManager.java``): per-id records {key_version, dim,
arena offset}, tombstones (:203-309), saved index version (:577-594), drift
audit (:649-689), count-by-version (:695-703) — as an append-only log with
CRC-framed records, replayed into an in-memory table on open, compacted on
demand.  Write protocol (crash consistency): arena append+fsync first, then
metadata append+fsync — a metadata record is the commit; recovery replays
until the first corrupt/truncated record and ignores arena tails.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass

_MAGIC = b"FSPML1\n"
_REC = struct.Struct("<BIIIqI")  # kind, id, key_version, dim, arena_off, crc
_KIND_PUT = 1
_KIND_TOMBSTONE = 2
_KIND_INDEX_VERSION = 3   # id field carries the version
_KIND_UNDELETE = 4


@dataclass
class PointMeta:
    key_version: int
    dim: int
    arena_off: int
    deleted: bool = False


class MetadataLog:
    def __init__(self, path: str):
        self.path = path
        self.table: dict[int, PointMeta] = {}
        self.index_version: int = 0
        self._version_counts: dict[int, int] = {}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fresh = not os.path.exists(path)
        if not fresh:
            self._replay()
        self._f = open(path, "ab")
        if fresh:
            self._f.write(_MAGIC)
            self._f.flush()

    # -- write ----------------------------------------------------------------

    def _append(self, kind: int, pid: int, kv: int, dim: int, off: int) -> None:
        body = struct.pack("<BIIIq", kind, pid, kv, dim, off)
        crc = zlib.crc32(body)
        self._f.write(body + struct.pack("<I", crc))

    def put(self, pid: int, key_version: int, dim: int, arena_off: int) -> None:
        self._append(_KIND_PUT, pid, key_version, dim, arena_off)
        prev = self.table.get(pid)
        if prev is not None and not prev.deleted:
            self._bump(prev.key_version, -1)
        self.table[pid] = PointMeta(key_version, dim, arena_off)
        self._bump(key_version, +1)

    def put_batch(self, pids, key_version: int, dim: int, offsets) -> None:
        for pid, off in zip(pids, offsets):
            self.put(int(pid), key_version, dim, int(off))

    def tombstone(self, pid: int) -> None:
        m = self.table.get(pid)
        if m is None or m.deleted:
            return
        self._append(_KIND_TOMBSTONE, pid, 0, 0, 0)
        m.deleted = True
        self._bump(m.key_version, -1)

    def undelete(self, pid: int) -> None:
        m = self.table.get(pid)
        if m is None or not m.deleted:
            return
        self._append(_KIND_UNDELETE, pid, 0, 0, 0)
        m.deleted = False
        self._bump(m.key_version, +1)

    def save_index_version(self, version: int) -> None:
        self._append(_KIND_INDEX_VERSION, version, 0, 0, 0)
        self.index_version = version

    def flush(self) -> None:
        self._f.flush()
        os.fsync(self._f.fileno())

    # -- read ----------------------------------------------------------------

    def get(self, pid: int) -> PointMeta | None:
        m = self.table.get(pid)
        return None if m is None or m.deleted else m

    def is_deleted(self, pid: int) -> bool:
        m = self.table.get(pid)
        return m is not None and m.deleted

    def count_with_version(self, kv: int) -> int:
        """Live points still bound to key version kv (reference :695-703)."""
        return self._version_counts.get(kv, 0)

    def live_versions(self) -> set[int]:
        return {kv for kv, c in self._version_counts.items() if c > 0}

    def live_ids(self):
        return (pid for pid, m in self.table.items() if not m.deleted)

    def __len__(self) -> int:
        return sum(1 for _ in self.live_ids())

    def _bump(self, kv: int, delta: int) -> None:
        self._version_counts[kv] = self._version_counts.get(kv, 0) + delta

    # -- recovery / maintenance ------------------------------------------------

    def _replay(self) -> None:
        raw = open(self.path, "rb").read()
        if not raw.startswith(_MAGIC):
            raise ValueError(f"bad metadata log magic in {self.path}")
        off = len(_MAGIC)
        step = _REC.size
        while off + step <= len(raw):
            kind, pid, kv, dim, aoff, crc = _REC.unpack_from(raw, off)
            if zlib.crc32(raw[off:off + step - 4]) != crc:
                break  # crash tail — ignore the rest
            if kind == _KIND_PUT:
                prev = self.table.get(pid)
                if prev is not None and not prev.deleted:
                    self._bump(prev.key_version, -1)
                self.table[pid] = PointMeta(kv, dim, aoff)
                self._bump(kv, +1)
            elif kind == _KIND_TOMBSTONE:
                m = self.table.get(pid)
                if m is not None and not m.deleted:
                    m.deleted = True
                    self._bump(m.key_version, -1)
            elif kind == _KIND_UNDELETE:
                m = self.table.get(pid)
                if m is not None and m.deleted:
                    m.deleted = False
                    self._bump(m.key_version, +1)
            elif kind == _KIND_INDEX_VERSION:
                self.index_version = pid
            off += step

    def compact(self) -> None:
        """Rewrite the log to current state only (atomic replace)."""
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_MAGIC)
            def emit(kind, pid, kv, dim, aoff):
                body = struct.pack("<BIIIq", kind, pid, kv, dim, aoff)
                f.write(body + struct.pack("<I", zlib.crc32(body)))
            if self.index_version:
                emit(_KIND_INDEX_VERSION, self.index_version, 0, 0, 0)
            for pid, m in self.table.items():
                emit(_KIND_PUT, pid, m.key_version, m.dim, m.arena_off)
                if m.deleted:
                    emit(_KIND_TOMBSTONE, pid, 0, 0, 0)
            f.flush()
            os.fsync(f.fileno())
        self._f.close()
        os.replace(tmp, self.path)
        self._f = open(self.path, "ab")

    def close(self) -> None:
        try:
            self.flush()
        finally:
            self._f.close()
