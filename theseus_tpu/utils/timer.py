"""Timing/profiling helpers (reference theseus/utils/utils.py:225 Timer,
:279 Profiler). On accelerators the context manager synchronizes via a host
transfer of a sentinel (the experimental axon backend's block_until_ready
does not synchronize), so wall times reflect device completion."""

from __future__ import annotations

import cProfile
import pstats
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


def device_sync():
    """Force completion of all pending work on the default device."""
    np.asarray(jax.device_put(0.0) + 0.0)


class Timer:
    """Scoped timer with per-caller stats (reference utils.py:225-276)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.stats: Dict[str, list] = defaultdict(list)
        self._name: Optional[str] = None

    def start(self, name: str):
        self._name = name
        if self.sync:
            device_sync()
        self._t0 = time.perf_counter()
        return self

    def end(self):
        if self.sync:
            device_sync()
        elapsed = time.perf_counter() - self._t0
        self.stats[self._name].append(elapsed)
        return elapsed

    def __call__(self, name: str):
        self._name = name
        return self

    def __enter__(self):
        if self.sync:
            device_sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.end()
        return False

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "mean": float(np.mean(v)),
                "min": float(np.min(v)),
                "max": float(np.max(v)),
                "count": len(v),
            }
            for k, v in self.stats.items()
        }


class Profiler:
    """cProfile wrapper (reference utils.py:279-306)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._prof = cProfile.Profile()

    def enable(self):
        if self.enabled:
            self._prof.enable()

    def disable(self):
        if self.enabled:
            self._prof.disable()

    def print(self, sort: str = "cumtime", limit: int = 30):
        if self.enabled:
            pstats.Stats(self._prof).sort_stats(sort).print_stats(limit)

    def dump(self, path: str):
        if self.enabled:
            self._prof.dump_stats(path)


def fresh_eps(i: int, scale: float = 1e-7) -> float:
    """A small input perturbation that is unique ACROSS PROCESSES.

    The remote TPU executor caches results of bit-identical (program, input)
    executions across processes and sessions; a fixed eps schedule like
    1e-7*(i+1) collides with any earlier run of the same program on the same
    state, and min-over-reps then picks a zero-cost cache hit (observed
    2026-08-19: whole-iteration marginals collapsing to ~0.004 ms). Mixing
    time_ns into the mantissa keeps every timed call unique while staying
    O(scale) so the perturbation cannot change convergence behavior."""
    salt = (time.time_ns() % 999_983) / 999_983.0  # (0, 1)
    return scale * (i + 1 + salt)
