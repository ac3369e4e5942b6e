"""Observability: sims/sec meter, jax.profiler traces, device memory.

The reference's only instrumentation is wall-clock phase timing printed in
__main__ (fast_monte_carlo_cfb.py:1674-1714, 1754-1759).  Here the same
phase meter is a reusable object emitting structured records, plus hooks
into jax.profiler for real traces (SURVEY §5.1 rebuild note).
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class SimMeter:
    """Phase timer + games/sec meter with structured output."""

    records: List[Dict] = field(default_factory=list)
    _starts: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, **meta):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.records.append({"phase": name, "seconds": dt, **meta})

    def record_run(self, n_games: int, seconds: float, **meta) -> float:
        rate = n_games / seconds if seconds > 0 else float("inf")
        self.records.append({"phase": "simulate", "seconds": seconds,
                             "games": n_games, "games_per_sec": rate, **meta})
        return rate

    def summary(self) -> Dict:
        total = sum(r["seconds"] for r in self.records)
        sim = [r for r in self.records if r["phase"] == "simulate"]
        out = {"total_time_sec": total,
               "sim_time_sec": sum(r["seconds"] for r in sim),
               "io_time_sec": sum(r["seconds"] for r in self.records
                                  if r["phase"] in ("save", "io"))}
        if sim:
            out["games"] = sum(r.get("games", 0) for r in sim)
            out["games_per_sec"] = out["games"] / out["sim_time_sec"] \
                if out["sim_time_sec"] else 0.0
        return out

    def dump(self) -> str:
        return "\n".join(json.dumps(r) for r in self.records)


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def device_memory_stats() -> Dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {k: s[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                           if k in s}
    return out
