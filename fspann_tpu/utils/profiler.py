"""Profiler: named timings + per-(query, K) rows, CSV export.

Reference counterpart: ``common/Profiler.java`` (:59-164) — start/stop named
timers and a wide per-query row schema exported to ``profiler_metrics.csv``;
plus the last-query pipeline counters surfaced by the query service.
"""

from __future__ import annotations

import csv
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import asdict, dataclass, field


@dataclass
class QueryRow:
    """Per-(query, K) metrics row (subset of the reference's 31 fields,
    same semantics/names where they exist)."""

    query_index: int
    k: int
    recall_at_k: float
    distance_ratio_at_k: float
    candidate_ratio_at_k: float
    cand_raw: int
    cand_unique: int
    cand_refined: int
    cand_decrypted: int
    returned: int
    retried: bool
    route_ms: float
    decrypt_ms: float
    refine_ms: float
    server_ms: float
    token_key_version: int
    probes: int


@dataclass
class Profiler:
    timings: dict = field(default_factory=lambda: defaultdict(list))
    rows: list = field(default_factory=list)
    _open: dict = field(default_factory=dict)

    def start(self, name: str) -> None:
        self._open[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        t0 = self._open.pop(name, None)
        if t0 is None:
            return 0.0
        dt = time.perf_counter() - t0
        self.timings[name].append(dt)
        return dt

    @contextmanager
    def timed(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def record_row(self, row: QueryRow) -> None:
        self.rows.append(row)

    def total(self, name: str) -> float:
        return sum(self.timings.get(name, []))

    def export_csv(self, path: str) -> None:
        if not self.rows:
            return
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(asdict(self.rows[0])))
            w.writeheader()
            for r in self.rows:
                w.writerow(asdict(r))

    def summary(self) -> dict[str, float]:
        return {name: sum(v) for name, v in self.timings.items()}
